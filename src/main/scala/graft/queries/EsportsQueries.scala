package graft.queries

import graft.Tables
import graft.functions.{Classify, EsportsRules, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** E2-parity pipeline with the reference's REAL rule tables — the full
  * esports market flow (transformer_data.py:340-455): 37-keyword
  * include filter → 16-keyword exclude filter → content dedup →
  * gaming_type (ordered 13-entry map) + bet_type (compound decision
  * chain) → summary. Rule tables come verbatim from
  * [[graft.functions.EsportsRules]]; both the Spark plan and the DuckDB
  * oracle SQL are generated from those same Seqs so they cannot drift.
  *
  * The market `question` column is synthesized deterministically from
  * events rows (the q52/q53 fixture pattern): the eight templates are
  * chosen to pin the subtle orderings — a question matching both
  * 'spread' and 'map' must classify Spread (chain order), one matching
  * 'iem ' and 'esports' must classify CS:GO (mapping order), an
  * include+exclude match must be dropped, and a constant template
  * exercises the dedup collapse.
  *
  * Bug-for-bug parity note: the 'rlcs' template classifies as
  * **League of Legends**, not Rocket League — 'lcs ' (a LoL keyword)
  * is a substring of 'rlcs ' and LoL precedes Rocket League in the
  * reference's ordered mapping (transformer_data.py:409,416). The
  * reference has exactly this shadowing; parity means keeping it.
  */
object EsportsQueries {

  import EsportsRules._

  /** The eight market-question templates (Spark side). */
  private def questionCol(eventId: org.apache.spark.sql.Column,
                          userId: org.apache.spark.sql.Column) = {
    val m = eventId % 8
    when(m === 0, lit("The International dota 2: who will win the grand final?"))
      .when(m === 1, format_string("VCT Americas: over %d.5 kills and under total?", userId % 30))
      .when(m === 2, lit("Who will win the NBA finals?"))
      .when(m === 3, format_string("csgo team stock price by more than %d?", eventId % 9))
      .when(m === 4, format_string("IEM Katowice map %d winner: spread by more than %d.5?",
        eventId % 7, userId % 5))
      .when(m === 5, lit("fortnite mvp and best player of dreamhack?"))
      .when(m === 6, format_string("rocket league rlcs round %d: first team to win?", eventId % 5))
      .otherwise(lit("esports awards ceremony tickets"))
  }

  /** The same eight templates as a DuckDB CASE over events columns. */
  private val QuestionSqlCase: String =
    """CASE CAST(event_id % 8 AS INT)
      |  WHEN 0 THEN 'The International dota 2: who will win the grand final?'
      |  WHEN 1 THEN printf('VCT Americas: over %d.5 kills and under total?', user_id % 30)
      |  WHEN 2 THEN 'Who will win the NBA finals?'
      |  WHEN 3 THEN printf('csgo team stock price by more than %d?', event_id % 9)
      |  WHEN 4 THEN printf('IEM Katowice map %d winner: spread by more than %d.5?', event_id % 7, user_id % 5)
      |  WHEN 5 THEN 'fortnite mvp and best player of dreamhack?'
      |  WHEN 6 THEN printf('rocket league rlcs round %d: first team to win?', event_id % 5)
      |  ELSE 'esports awards ceremony tickets' END""".stripMargin

  /** Full reference pipeline: include → exclude → dedup → classify →
    * summarize (validate_and_clean_gaming_markets composed with the
    * Delta-extract filters, transformer_data.py:340-455). */
  val q74EsportsPipeline = GQuery(
    "q74_esports_pipeline",
    (s, d) => {
      import s.implicits._
      val markets = Tables.events(s, d)
        .withColumn("question", questionCol($"event_id", $"user_id"))
      val filtered = markets
        .filter(Classify.containsAny($"question", IncludeKeywords) &&
          Classify.containsNone($"question", ExcludeKeywords))
      val deduped = filtered
        .withColumn("fp", TextAnalysis.fingerprint($"question"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"fp").orderBy($"event_id".asc)))
        .filter($"rn" === 1)
      deduped
        .withColumn("gaming_type", EsportsRules.gamingType($"question"))
        .withColumn("bet_type", EsportsRules.betType($"question"))
        .groupBy($"gaming_type", $"bet_type")
        .agg(count(lit(1)).as("n_markets"))
    },
    Some(s"""WITH src AS (
            |  SELECT event_id, user_id, $QuestionSqlCase AS question FROM events),
            |filt AS (
            |  SELECT * FROM src
            |  WHERE ${Classify.containsAnySql("question", IncludeKeywords)}
            |    AND NOT ${Classify.containsAnySql("question", ExcludeKeywords)}),
            |dedup AS (
            |  SELECT * FROM (
            |    SELECT *, row_number() OVER (
            |      PARTITION BY md5(lower(regexp_replace(trim(question), '\\s+', ' ', 'g')))
            |      ORDER BY event_id) AS rn
            |    FROM filt) WHERE rn = 1)
            |SELECT ${gamingTypeSql("question")} AS gaming_type,
            |  ${betTypeSql("question")} AS bet_type,
            |  count(*) AS n_markets
            |FROM dedup GROUP BY gaming_type, bet_type""".stripMargin))

  /** The classifier surface itself, row-level and unfiltered — pins the
    * default paths (non-gaming question → 'Esports General' / the
    * bet-type else-chain) and the null → null early returns. */
  val q75ClassifierSurface = GQuery(
    "q75_classifier_surface",
    (s, d) => {
      import s.implicits._
      val q = when($"event_id" % 11 === 0, lit(null).cast("string"))
        .otherwise(questionCol($"event_id", $"user_id"))
      Tables.events(s, d)
        .withColumn("question", q)
        .select($"event_id",
          EsportsRules.gamingType($"question").as("gaming_type"),
          EsportsRules.betType($"question").as("bet_type"))
    },
    Some(s"""WITH src AS (
            |  SELECT event_id,
            |    CASE WHEN event_id % 11 = 0 THEN NULL ELSE $QuestionSqlCase END AS question
            |  FROM events)
            |SELECT event_id,
            |  ${gamingTypeSql("question")} AS gaming_type,
            |  ${betTypeSql("question")} AS bet_type
            |FROM src""".stripMargin))

  val all: Seq[GQuery] = Seq(q74EsportsPipeline, q75ClassifierSurface)
}
