package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's actual domain rule tables, ported verbatim — not
  * synthetic stand-ins (transformer_data.py:344-378 include/exclude
  * keyword lists, :406-426 ordered gaming_type mapping, :436-455
  * bet_type decision chain). A user porting the reference pipeline gets
  * the pipeline, keyword-for-keyword; the trailing spaces in entries
  * like "iem " / "vct " are load-bearing (they anchor tournament
  * abbreviations to word starts) and are preserved.
  */
object EsportsRules {

  /** Esports include keywords (transformer_data.py:345-367). */
  val IncludeKeywords: Seq[String] = Seq(
    // Juegos MOBA
    "dota", "dota 2", "dota2", "the international",
    "league of legends", "leagueoflegends",
    // FPS competitivos
    "valorant", "cs:go", "csgo", "counter-strike",
    "overwatch", "apex legends",
    "rainbow six", "r6",
    // Battle Royale competitivo
    "fortnite",
    // Otros esports
    "call of duty league", "cod league",
    "hearthstone", "starcraft",
    "rocket league",
    // Términos de competición esports
    "esports", "esport",
    // Torneos específicos
    "blast premier", "blast bounty", "esl pro", "iem ",
    "faceit", "pgl major", "vct ", "valorant champions",
    "lck ", "lcs ", "lec ", "worlds 20", "msi 20",
    "rlcs", "owcs", "hct ", "dreamhack")

  /** False-positive exclusions (transformer_data.py:373-378). */
  val ExcludeKeywords: Seq[String] = Seq(
    "nfl", "nba", "fifa world cup", "soccer", "baseball",
    "hockey ", "tennis", "golf ", "boxing", "ufc", "mma",
    "horse", "election", "politic", "stock", "bitcoin")

  /** Ordered gaming_type mapping (transformer_data.py:406-424) — most
    * specific first; iteration order is first-match-wins. */
  val GameMapping: Seq[(String, Seq[String])] = Seq(
    "DOTA" -> Seq("dota", "dota 2", "dota2", "the international",
      "ti8", "ti9", "ti10", "ti11", "ti12", "ti13"),
    "Valorant" -> Seq("valorant", "vct ", "valorant champions"),
    "CS:GO" -> Seq("cs:go", "csgo", "counter-strike", "blast premier",
      "blast bounty", "esl pro", "iem ", "faceit", "pgl major"),
    "League of Legends" -> Seq("league of legends", "leagueoflegends",
      "lck ", "lcs ", "lec ", "worlds 20", "msi 20"),
    "Fortnite" -> Seq("fortnite"),
    "Overwatch" -> Seq("overwatch", "owcs"),
    "Apex Legends" -> Seq("apex legends", "apex legends global"),
    "Call of Duty" -> Seq("call of duty league", "cod league", "cdl "),
    "Hearthstone" -> Seq("hearthstone", "hct "),
    "StarCraft" -> Seq("starcraft", "starcraft 2", "sc2"),
    "Rocket League" -> Seq("rocket league", "rlcs"),
    "Rainbow Six" -> Seq("rainbow six", "r6 siege", "six invitational"),
    "Esports General" -> Seq("esports", "esport"))

  val GamingTypeDefault = "Esports General"

  /** GameMapping flattened to the (keyword → label) shape the generic
    * ordered classifier consumes; flattening preserves the reference's
    * nested iteration order (outer mapping order, then keyword order). */
  val GameRules: Seq[(String, String)] =
    GameMapping.flatMap { case (label, kws) => kws.map(_ -> label) }

  /** F13 extract_gaming_type (transformer_data.py:393-426). Null
    * question → null, like the reference's early `return None`. */
  def gamingType(c: Column): Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(Classify.keywordClassifier(c, GameRules, GamingTypeDefault))

  def gamingTypeSql(col: String): String =
    s"CASE WHEN $col IS NULL THEN NULL ELSE ${Classify.keywordClassifierSql(col, GameRules, GamingTypeDefault)} END"

  /** F14 extract_bet_type (transformer_data.py:436-455): an ordered
    * decision chain with compound conditions, not a flat keyword table.
    * ('who will win' ⊃ 'will win', so the reference's OR there is
    * redundant and folded.) Null question → null. */
  def betType(c: Column): Column = {
    val q = lower(c)
    when(c.isNull, lit(null).cast("string"))
      .when(q.contains("will win"), lit("Match Winner"))
      .when(q.contains("spread") || q.contains("by more than") || q.contains("by less than"),
        lit("Spread"))
      .when(q.contains("over") && q.contains("under"), lit("Over/Under"))
      .when(q.contains("total") && (q.contains("point") || q.contains("kill")),
        lit("Over/Under"))
      .when(q.contains("first") && q.contains("win"), lit("First Blood"))
      .when(q.contains("mvp") || q.contains("best player"), lit("MVP/Best Player"))
      .when(q.contains("map") || q.contains("round"), lit("Round/Map Winner"))
      .otherwise(lit("Prop Bet"))
  }

  /** DuckDB twin of [[betType]], built from the same chain. */
  def betTypeSql(col: String): String = {
    def has(kw: String) = s"contains(lower($col), '$kw')"
    s"""CASE WHEN $col IS NULL THEN NULL
       | WHEN ${has("will win")} THEN 'Match Winner'
       | WHEN ${has("spread")} OR ${has("by more than")} OR ${has("by less than")} THEN 'Spread'
       | WHEN ${has("over")} AND ${has("under")} THEN 'Over/Under'
       | WHEN ${has("total")} AND (${has("point")} OR ${has("kill")}) THEN 'Over/Under'
       | WHEN ${has("first")} AND ${has("win")} THEN 'First Blood'
       | WHEN ${has("mvp")} OR ${has("best player")} THEN 'MVP/Best Player'
       | WHEN ${has("map")} OR ${has("round")} THEN 'Round/Map Winner'
       | ELSE 'Prop Bet' END""".stripMargin.replace("\n", "")
  }
}
