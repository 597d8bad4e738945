package graft.queries

import graft.Tables
import graft.functions.{Classify, Normalize, TextAnalysis}
import org.apache.spark.sql.functions._

/** Scalar-function + text-analysis coverage (SURVEY §2.8 F-series, P4-P8,
  * J4 explode; plus the training-data text stack). Each query applies the
  * library builders to real columns and mirrors the exact semantics in
  * DuckDB SQL — so the oracle validates the builders' edge behavior, not
  * just the aggregation around them.
  */
object TextQueries {

  /** J4/F9 explode-based bridge: doc → word rows → top-20 count
    * (reference analog: loader_NeonDB.py:464-491 tag bridges). */
  val q23ExplodeWords = GQuery(
    "q23_explode_words",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens($"text")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"word".asc)
        .limit(20)
    },
    Some("""SELECT word, count(*) AS n FROM (
           |  SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS word
           |  FROM documents)
           |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin))

  /** F7-ish JSON field extraction (regex-based so both engines share
    * semantics; reference re-parses JSON strings at every use site —
    * loader_NeonDB.py:287-304). */
  val q24JsonExtract = GQuery(
    "q24_json_extract",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("k", regexp_extract($"props", "\"k\":\\s*(\\d+)", 1).try_cast("long"))
        .groupBy($"event_type")
        .agg(sum($"k").as("k_total"), count(when($"k".isNotNull, 1)).as("n_with_k"))
    },
    Some("""SELECT event_type,
           |  CAST(sum(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS k_total,
           |  count(*) FILTER (WHERE TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) IS NOT NULL) AS n_with_k
           |FROM events GROUP BY event_type""".stripMargin))

  /** F13/F14 ordered keyword classifier (transformer_data.py:393-455):
    * first match wins, shared rule table renders both the Column chain
    * and the oracle CASE. */
  private val classifyRules = Seq(
    "stream" -> "Streaming", "window" -> "Windowing", "join" -> "Joins",
    "group" -> "Aggregation", "sort" -> "Sorting", "filter" -> "Filtering")

  val q25Classify = GQuery(
    "q25_classify_keywords",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("category",
          Classify.keywordClassifier($"text", classifyRules, "General"))
        .groupBy($"category").agg(count(lit(1)).as("n_docs"))
    },
    Some(s"""SELECT ${Classify.keywordClassifierSql("text", classifyRules, "General")} AS category,
            |  count(*) AS n_docs
            |FROM documents GROUP BY category""".stripMargin))

  /** P4/P5 include/exclude keyword filters as one compiled regex each
    * (transformer_data.py:343-382). */
  val q26KeywordFilter = GQuery(
    "q26_keyword_filter",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .filter(Classify.containsAny($"text", Seq("join", "merge", "hash")) &&
          Classify.containsNone($"text", Seq("stream", "window")))
        .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
    },
    Some("""SELECT lang, count(*) AS n_docs FROM documents
           |WHERE regexp_matches(lower(text), 'join|merge|hash')
           |  AND NOT regexp_matches(lower(text), 'stream|window')
           |GROUP BY lang""".stripMargin))

  /** F3 clean_string: collapse whitespace, strip control chars, truncate
    * (transformer_data.py:80-100). */
  val q27CleanString = GQuery(
    "q27_clean_string",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("cleaned", Normalize.cleanString($"text", 80))
        .groupBy($"lang").agg(
          count(lit(1)).as("n_docs"),
          sum(length($"cleaned")).as("total_len"),
          countDistinct($"cleaned").as("n_distinct"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(length(cleaned)) AS BIGINT) AS total_len,
           |  count(DISTINCT cleaned) AS n_distinct
           |FROM (SELECT lang, substring(regexp_replace(regexp_replace(trim(text), '\s+', ' ', 'g'),
           |        '[\x00-\x1f]', '', 'g'), 1, 80) AS cleaned
           |      FROM documents)
           |GROUP BY lang""".stripMargin))

  /** P6 word-boundary fallback filter (loader_NeonDB.py:749-781): the
    * \b-anchored alternation over a concat of text columns — "art" must
    * NOT match "part"-style substrings, unlike the plain contains
    * filters of q26. */
  val q64WordBoundary = GQuery(
    "q64_word_boundary",
    (s, d) => {
      import s.implicits._
      val pattern = Classify.wordBoundaryPattern(Seq("join", "scan", "sort"))
      Tables.documents(s, d)
        .filter(lower(concat_ws(" ", $"lang", $"text")).rlike(pattern))
        .groupBy($"source").agg(count(lit(1)).as("n_docs"))
    },
    Some("""SELECT source, count(*) AS n_docs FROM documents
           |WHERE regexp_matches(lower(concat_ws(' ', lang, text)), '\b(join|scan|sort)\b')
           |GROUP BY source""".stripMargin))

  /** F2 normalize_numeric, EU-locale branch: build "9.185,22"-style
    * mixed strings with printf (identical in both engines), parse back
    * via the reference's EU rule — strip dots, comma→decimal point
    * (transformer_data.py:63-75). */
  val q28NormalizeNumeric = GQuery(
    "q28_normalize_numeric",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("eu_str",
          concat(lit("9."), regexp_replace(format_string("%.2f", $"value"), "\\.", ",")))
        .withColumn("parsed", Normalize.numeric($"eu_str"))
        .groupBy($"event_type")
        .agg(round(sum($"parsed"), 2).as("total_value"),
          count(when($"parsed".isNull, 1)).as("n_unparsed"))
    },
    Some("""SELECT event_type,
           |  round(sum(CAST(replace(replace('9.' || replace(printf('%.2f', value), '.', ','), '.', ''), ',', '.') AS DOUBLE)), 2) AS total_value,
           |  0::BIGINT AS n_unparsed
           |FROM events GROUP BY event_type""".stripMargin))

  /** F1 normalize_boolean truthy/falsy tables (transformer_data.py:21-43). */
  val q29NormalizeBoolean = GQuery(
    "q29_normalize_boolean",
    (s, d) => {
      import s.implicits._
      val raw = when($"event_type" === "purchase", "yes")
        .when($"event_type" === "error", "0")
        .when($"event_type" === "signup", "TRUE")
        .when($"event_type" === "click", "n")
        .otherwise("maybe")
      Tables.events(s, d)
        .withColumn("flag", Normalize.boolean(raw))
        .groupBy($"flag").agg(count(lit(1)).as("n"))
    },
    Some("""SELECT flag, count(*) AS n FROM (
           |  SELECT CASE
           |    WHEN lower(trim(raw)) IN ('true','yes','1','t','y','si','sí') THEN true
           |    WHEN lower(trim(raw)) IN ('false','no','0','f','n') THEN false
           |    WHEN regexp_matches(lower(trim(raw)), '^-?\d+(\.\d+)?$')
           |      THEN CAST(lower(trim(raw)) AS DOUBLE) <> 0.0
           |    ELSE NULL END AS flag
           |  FROM (SELECT CASE event_type WHEN 'purchase' THEN 'yes' WHEN 'error' THEN '0'
           |               WHEN 'signup' THEN 'TRUE' WHEN 'click' THEN 'n' ELSE 'maybe' END AS raw
           |        FROM events))
           |GROUP BY flag""".stripMargin))

  /** P8 sentinel-null normalization (spark_cleaner.py:54-71). */
  val q30NullSentinels = GQuery(
    "q30_null_sentinels",
    (s, d) => {
      import s.implicits._
      val raw = when($"value" < 20, "N/A")
        .when($"value" < 40, " null ")
        .when($"value" < 60, "-")
        .otherwise($"event_type")
      Tables.events(s, d)
        .withColumn("norm", Normalize.nullifySentinels(raw))
        .groupBy($"norm").agg(count(lit(1)).as("n"))
    },
    Some("""SELECT norm, count(*) AS n FROM (
           |  SELECT CASE WHEN lower(trim(raw)) IN ('','none','null','n/a','na','nan','nil','undefined','-')
           |              THEN NULL ELSE raw END AS norm
           |  FROM (SELECT CASE WHEN value < 20 THEN 'N/A' WHEN value < 40 THEN ' null '
           |               WHEN value < 60 THEN '-' ELSE event_type END AS raw
           |        FROM events))
           |GROUP BY norm""".stripMargin))

  /** F15/F16 fill-default chains (spark_cleaner.py:127-147). */
  val q31FillDefaults = GQuery(
    "q31_fill_defaults",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("source_filled",
          coalesce(nullif($"source", lit("src0")), lit("defaulted")))
        .groupBy($"source_filled").agg(count(lit(1)).as("n_docs"))
    },
    Some("""SELECT coalesce(nullif(source, 'src0'), 'defaulted') AS source_filled,
           |  count(*) AS n_docs
           |FROM documents GROUP BY source_filled""".stripMargin))

  /** Token statistics per language (training-data token accounting). */
  val q35TokenStats = GQuery(
    "q35_token_stats",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("n_tokens", TextAnalysis.tokenCount($"text"))
        .groupBy($"lang").agg(
          count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          round(avg($"n_tokens"), 4).as("avg_tokens"),
          max($"n_tokens").as("max_tokens"))
    },
    Some("""SELECT lang, count(*) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           |  round(avg(n_tokens), 4) AS avg_tokens,
           |  CAST(max(n_tokens) AS INT) AS max_tokens
           |FROM (SELECT lang, len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
           |      FROM documents)
           |GROUP BY lang""".stripMargin),
    benchmark = true)

  /** Quality scoring: distinct-token ratio + stopword ratio + length
    * blend, averaged per source. */
  val q36QualityScore = GQuery(
    "q36_quality_score",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("q", TextAnalysis.qualityScore($"text"))
        .groupBy($"source").agg(
          count(lit(1)).as("n_docs"),
          round(avg($"q"), 4).as("avg_quality"),
          round(min($"q"), 4).as("min_quality"),
          round(max($"q"), 4).as("max_quality"))
    },
    Some(s"""SELECT source, count(*) AS n_docs,
            |  round(avg(q), 4) AS avg_quality,
            |  round(min(q), 4) AS min_quality,
            |  round(max(q), 4) AS max_quality
            |FROM (
            |  SELECT source, round(
            |    0.4 * (len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE))
            |    + 0.3 * least(5.0 * (len(list_filter(toks, x -> lower(x) IN (${TextAnalysis.Stopwords.map("'" + _ + "'").mkString(",")})) ) / CAST(len(toks) AS DOUBLE)), 1.0)
            |    + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0), 4) AS q
            |  FROM (SELECT source, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
            |        FROM documents))
            |GROUP BY source""".stripMargin))

  /** Language-ID heuristic vs the labeled lang column: confusion counts. */
  val q37LangId = GQuery(
    "q37_langid",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("predicted", TextAnalysis.langId($"text"))
        .groupBy($"lang", $"predicted").agg(count(lit(1)).as("n"))
    },
    Some {
      val hits = TextAnalysis.LangMarkers.map { case (lang, p) =>
        s"len(regexp_extract_all(lower(text), ' $p ')) AS ${lang}_hits"
      }.mkString(",\n  ")
      s"""SELECT lang, predicted, count(*) AS n FROM (
         |  SELECT lang, CASE
         |    WHEN es_hits > greatest(en_hits, de_hits) THEN 'es'
         |    WHEN de_hits > en_hits THEN 'de'
         |    ELSE 'en' END AS predicted
         |  FROM (SELECT lang, $hits FROM documents))
         |GROUP BY lang, predicted""".stripMargin
    })

  /** Document fingerprinting: md5 over normalized text, uniqueness per
    * source (exact-dedup key; scales as a single hash-shuffle). */
  val q38Fingerprint = GQuery(
    "q38_fingerprint",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("fp", TextAnalysis.fingerprint($"text"))
        .groupBy($"source").agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"fp").as("n_unique"))
    },
    Some("""SELECT source, count(*) AS n_docs,
           |  count(DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))) AS n_unique
           |FROM documents GROUP BY source""".stripMargin))

  /** F2 again, but through the registered NATIVE Catalyst expression
    * (NormalizeNumericExpr with doGenCode) — proves the SQL-surface
    * registration and the codegen path agree with the oracle. */
  val q49NativeNumeric = GQuery(
    "q49_native_numeric",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("eu_str",
          concat(lit("9."), regexp_replace(format_string("%.2f", $"value"), "\\.", ",")))
        .withColumn("parsed", call_function("normalize_numeric_native", $"eu_str"))
        .groupBy($"event_type")
        .agg(round(sum($"parsed"), 2).as("total_value"))
    },
    Some("""SELECT event_type,
           |  round(sum(CAST(replace(replace('9.' || replace(printf('%.2f', value), '.', ','), '.', ''), ',', '.') AS DOUBLE)), 2) AS total_value
           |FROM events GROUP BY event_type""".stripMargin))

  val all: Seq[GQuery] = Seq(
    q23ExplodeWords, q24JsonExtract, q25Classify, q26KeywordFilter,
    q27CleanString, q28NormalizeNumeric, q29NormalizeBoolean,
    q30NullSentinels, q31FillDefaults, q35TokenStats, q36QualityScore,
    q37LangId, q38Fingerprint, q49NativeNumeric, q64WordBoundary)
}
