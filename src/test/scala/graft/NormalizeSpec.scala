package graft

import graft.functions.Normalize
import org.apache.spark.sql.functions._

/** Edge-case coverage for the scalar normalization library (SURVEY §5:
  * EU numbers transformer_data.py:66-71, truthy strings :38-41,
  * quote-repair lists :115-117, sentinel nulls spark_cleaner.py:65-67). */
class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): Any = {
    val df = Seq(Option(input)).toDF("v")
    df.select(c).collect()(0).get(0)
  }
  private def oneNull(c: org.apache.spark.sql.Column): Any =
    Seq[Option[String]](None).toDF("v").select(c).collect()(0).get(0)

  test("normalize_boolean truthy/falsy/numeric/garbage") {
    val b = Normalize.boolean($"v")
    assert(one[Boolean](b, "true") == true)
    assert(one[Boolean](b, " YES ") == true)
    assert(one[Boolean](b, "sí") == true)
    assert(one[Boolean](b, "0") == false)
    assert(one[Boolean](b, "no") == false)
    assert(one[Boolean](b, "2") == true)     // bool(int(v)) semantics
    assert(one[Boolean](b, "-1.5") == true)
    assert(one[Boolean](b, "maybe") == null)
    assert(oneNull(b) == null)
  }

  test("normalize_numeric reference-exact: EU/US-thousands/mixed/garbage") {
    val n = Normalize.numeric($"v")
    assert(one[Double](n, "1.234,56") == 1234.56)  // EU mixed
    assert(one[Double](n, "1,234") == 1234.0)      // bare commas = thousands
    assert(one[Double](n, "185,22") == 18522.0)    // ditto (reference rule!)
    assert(one[Double](n, "1,234.56") == null)     // mixed US form -> float() fails
    assert(one[Double](n, "42") == 42.0)
    assert(one[Double](n, "-3.5") == -3.5)
    assert(one[Double](n, "abc") == null)
    assert(one[Double](n, "") == null)
  }

  test("clean_string collapse/strip/truncate/blank") {
    val c = Normalize.cleanString($"v", 10)
    assert(one[String](c, "  a\t\tb\nc  ") == "a b c")
    assert(one[String](c, "x" * 50) == "x" * 10)
    assert(one[String](c, "   ") == null)
    assert(oneNull(c) == null)
  }

  private def asList(v: Any): List[Any] =
    Option(v).map(_.asInstanceOf[scala.collection.Seq[Any]].toList).orNull

  test("prices lenient JSON list with quote repair") {
    val p = Normalize.prices($"v")
    assert(asList(one[Any](p, """[0.5, 0.5]""")) == List(0.5, 0.5))
    assert(asList(one[Any](p, """['0.1', 'x', '0.9']""")) == List(0.1, 0.9))
    assert(one[Any](p, "not a list") == null)
    assert(one[Any](p, "[]") == null)
  }

  test("outcomes uppercased, tags lowercased+deduped") {
    val o = Normalize.outcomes($"v")
    assert(asList(one[Any](o, """[" yes ", "No"]""")) == List("YES", "NO"))
    val t = Normalize.tags($"v")
    assert(asList(one[Any](t, """["ESports", "esports", "LoL"]""")) == List("esports", "lol"))
  }

  test("sentinel nulls") {
    val s = Normalize.nullifySentinels($"v")
    for (bad <- Seq("", "None", " null ", "N/A", "NaN", "-", "undefined"))
      assert(one[String](s, bad) == null, s"sentinel '$bad'")
    assert(one[String](s, "real") == "real")
  }

  test("dayofweek Monday=0 convention and weekend flag") {
    val df = Seq("2024-01-01", "2024-01-06", "2024-01-07").toDF("v") // Mon, Sat, Sun
      .select(Normalize.dayOfWeekMonday0(to_date($"v")).as("dow"),
        Normalize.isWeekend(to_date($"v")).as("we"))
    assert(df.collect().map(r => (r.getInt(0), r.getBoolean(1))).toSeq ==
      Seq((0, false), (5, true), (6, true)))
  }

  test("tagObjectLabels: 3-way coalesce with Python-truthiness fallthrough") {
    val l = Normalize.tagObjectLabels($"v")
    // empty-string label falls through to slug; missing keys skip ahead
    assert(asList(one[Any](l, """[{'label': '', 'slug': 'x'}, {'id': '7'}]""")) == List("x", "7"))
    // whitespace-only label is SELECTED (truthy in Python) then dropped
    // post-strip — the slug must NOT rescue the item
    assert(asList(one[Any](l, """[{'label': ' ', 'slug': 'x'}]""")) == List())
    assert(asList(one[Any](l, """[{'label': 'a'}, {'slug': 'b'}]""")) == List("a", "b"))
    assert(asList(one[Any](l, "[]")) == List())   // reference returns [], not None
    assert(one[Any](l, "nan") == null)
  }

  test("seriesIds: object-or-list polymorphic field") {
    val i = Normalize.seriesIds($"v")
    assert(asList(one[Any](i, """{'id': 'ser-1'}""")) == List("ser-1"))
    assert(asList(one[Any](i, """[{'id': 'a'}, {'id': 'b'}, {'x': 1}]""")) == List("a", "b"))
    assert(asList(one[Any](i, """[{'id': ' '}]""")) == List())  // blank id dropped
    assert(one[Any](i, "nan") == null)
    assert(oneNull(i) == null)
  }

  test("sizeOrZero: null array -> 0 (not Spark's -1)") {
    val df = Seq(Some(Seq(1, 2)), None).toDF("v")
    assert(df.select(Normalize.sizeOrZero($"v")).collect().map(_.getInt(0)).toSeq == Seq(2, 0))
  }

  test("esports rule tables: ordered first-match incl. reference's rlcs/lcs shadowing") {
    import graft.functions.EsportsRules
    val g = EsportsRules.gamingType($"v")
    assert(one[String](g, "IEM Katowice esports grand final") == "CS:GO") // mapping order beats 'esports'
    assert(one[String](g, "Rocket League RLCS major") == "League of Legends") // bug-for-bug: 'lcs ' ⊂ 'rlcs '
    assert(one[String](g, "rocket league grand slam") == "Rocket League")
    assert(one[String](g, "chess world cup") == "Esports General") // default
    assert(oneNull(g) == null)
  }

  test("bet_type decision chain order and compound conditions") {
    import graft.functions.EsportsRules
    val b = EsportsRules.betType($"v")
    assert(one[String](b, "who will win: spread edition") == "Match Winner") // will-win before spread
    assert(one[String](b, "spread on map 3") == "Spread")                    // spread before map
    assert(one[String](b, "over 20.5 and under kills") == "Over/Under")
    assert(one[String](b, "total kills in game") == "Over/Under")            // total+kill branch
    assert(one[String](b, "first team to win a round") == "First Blood")     // first+win before round
    assert(one[String](b, "series mvp") == "MVP/Best Player")
    assert(one[String](b, "round 5 result") == "Round/Map Winner")
    assert(one[String](b, "handshake at the end?") == "Prop Bet")
    assert(oneNull(b) == null)
  }
}
