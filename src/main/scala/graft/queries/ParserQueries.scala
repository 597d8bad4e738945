package graft.queries

import graft.Tables
import graft.functions.Normalize
import org.apache.spark.sql.functions._

/** Oracle coverage for the lenient list/object parsers — F4–F6
  * (transformer_data.py:102-212) and F8/F10 (loader_NeonDB.py:408-429,
  * :786-807). Each query synthesizes the same JSON-ish string column in
  * Spark and in the DuckDB oracle from events-table values (the q52/q53
  * pattern), so the parser semantics — unparsable-element drop,
  * empty→null, non-list→null, and the deliberate apostrophe-safety
  * divergence of [[Normalize.repairJson]] (a string already carrying a
  * double quote is NOT single-quote-repaired, so `["it's", "2.5"]`
  * parses here where the reference's unconditional replace corrupts it,
  * transformer_data.py:115-117) — are hash-compared end-to-end, not
  * just unit-asserted.
  *
  * The DuckDB twin of the repair + parse, shared by all five oracles:
  * trim → conditional quote replace → json_valid/json_type guard →
  * from_json. Mirrors exactly what repairJson + Spark from_json do on
  * these inputs (malformed → null, non-array → null).
  */
object ParserQueries {

  /** DuckDB CTE fragment: src(event_id, s) → rep(event_id, s, r) with r
    * the repaired JSON text. */
  private def repCte(synthCase: String): String =
    s"""src AS (
       |  SELECT event_id, user_id, event_type, $synthCase AS s FROM events),
       |rep AS (
       |  SELECT event_id, s,
       |    CASE WHEN contains(trim(s), '"') THEN trim(s)
       |         ELSE replace(trim(s), '''', '"') END AS r
       |  FROM src)""".stripMargin

  private val ParsedStrArr =
    """CASE WHEN s IS NULL OR NOT json_valid(r) OR json_type(r) <> 'ARRAY' THEN NULL
      |     ELSE from_json(r, '["VARCHAR"]') END""".stripMargin

  /** F4 normalize_prices end-to-end: numeric coercion, unparsable
    * elements dropped, non-list → null, empty/all-dropped → null, and
    * the apostrophe-divergence case. */
  val q69NormalizePrices = GQuery(
    "q69_normalize_prices",
    (s, d) => {
      import s.implicits._
      val m = $"event_id" % 6
      val raw = when(m === 0, format_string("['%d.25', '%d.75']", $"user_id", $"user_id"))
        .when(m === 1, format_string(" ['%d', 'x', '%d.5'] ", $"user_id", $"event_id"))
        .when(m === 2, lit("not a list"))
        .when(m === 3, lit("[]"))
        .when(m === 4, lit(null).cast("string"))
        .otherwise(format_string("[\"it's\", \"%d.5\"]", $"user_id"))
      // Arrays never cross the compare wire (the driver's pandas sort
      // can't hash them): join to a '|' string, fixed 2-dp printf on
      // both sides so double→string reprs can't diverge.
      Tables.events(s, d)
        .withColumn("prices", Normalize.prices(raw))
        .select($"event_id",
          array_join(transform($"prices", x => format_string("%.2f", x)), "|").as("prices"),
          Normalize.sizeOrZero($"prices").as("n_prices"))
    },
    Some(s"""WITH ${repCte(
             """CASE CAST(event_id % 6 AS INT)
               |      WHEN 0 THEN printf('[''%d.25'', ''%d.75'']', user_id, user_id)
               |      WHEN 1 THEN printf(' [''%d'', ''x'', ''%d.5''] ', user_id, event_id)
               |      WHEN 2 THEN 'not a list'
               |      WHEN 3 THEN '[]'
               |      WHEN 4 THEN NULL
               |      ELSE printf('["it''s", "%d.5"]', user_id) END""".stripMargin)},
            |parsed AS (SELECT event_id, $ParsedStrArr AS p FROM rep),
            |pr AS (SELECT event_id,
            |  list_filter(list_transform(p, x -> TRY_CAST(x AS DOUBLE)), x -> x IS NOT NULL) AS d
            |  FROM parsed)
            |SELECT event_id,
            |  array_to_string(list_transform(
            |    CASE WHEN len(d) > 0 THEN d ELSE NULL END, x -> printf('%.2f', x)), '|') AS prices,
            |  CAST(CASE WHEN d IS NULL OR len(d) = 0 THEN 0 ELSE len(d) END AS INT) AS n_prices
            |FROM pr""".stripMargin))

  /** F5 normalize_outcomes end-to-end: trim+upper, blank elements
    * dropped, empty → null. */
  val q70NormalizeOutcomes = GQuery(
    "q70_normalize_outcomes",
    (s, d) => {
      import s.implicits._
      val m = $"event_id" % 5
      val raw = when(m === 0, lit("[' yes', 'No ']"))
        .when(m === 1, format_string("[' %s ', '']", $"event_type"))
        .when(m === 2, lit("NO_LIST"))
        .when(m === 3, lit("[]"))
        .otherwise(lit(null).cast("string"))
      Tables.events(s, d)
        .withColumn("outcomes", Normalize.outcomes(raw))
        .select($"event_id", array_join($"outcomes", "|").as("outcomes"),
          Normalize.sizeOrZero($"outcomes").as("n_outcomes"))
    },
    Some(s"""WITH ${repCte(
             """CASE CAST(event_id % 5 AS INT)
               |      WHEN 0 THEN '['' yes'', ''No '']'
               |      WHEN 1 THEN printf('['' %s '', '''']', event_type)
               |      WHEN 2 THEN 'NO_LIST'
               |      WHEN 3 THEN '[]'
               |      ELSE NULL END""".stripMargin)},
            |parsed AS (SELECT event_id, $ParsedStrArr AS p FROM rep),
            |cl AS (SELECT event_id,
            |  list_filter(list_transform(p, x -> upper(trim(x))), x -> x IS NOT NULL AND x <> '') AS c
            |  FROM parsed)
            |SELECT event_id,
            |  array_to_string(CASE WHEN len(c) > 0 THEN c ELSE NULL END, '|') AS outcomes,
            |  CAST(CASE WHEN c IS NULL OR len(c) = 0 THEN 0 ELSE len(c) END AS INT) AS n_outcomes
            |FROM cl""".stripMargin))

  /** F6 parse_tags end-to-end: lower+trim, set-dedup. The reference's
    * `list(set(...))` order is arbitrary, so both sides sort the array
    * for the value compare. */
  val q71ParseTags = GQuery(
    "q71_parse_tags",
    (s, d) => {
      import s.implicits._
      val m = $"event_id" % 4
      val raw = when(m === 0,
          format_string("['Tag%d', 'tag%d', ' TAG%d ']", $"user_id", $"user_id", $"user_id"))
        .when(m === 1, format_string("['A%d', 'b%d']", $"user_id" % 3, $"event_id" % 7))
        .when(m === 2, lit("nan"))
        .otherwise(lit(null).cast("string"))
      Tables.events(s, d)
        .withColumn("tags", array_sort(Normalize.tags(raw)))
        .select($"event_id", array_join($"tags", "|").as("tags"),
          Normalize.sizeOrZero($"tags").as("n_tags"))
    },
    Some(s"""WITH ${repCte(
             """CASE CAST(event_id % 4 AS INT)
               |      WHEN 0 THEN printf('[''Tag%d'', ''tag%d'', '' TAG%d '']', user_id, user_id, user_id)
               |      WHEN 1 THEN printf('[''A%d'', ''b%d'']', user_id % 3, event_id % 7)
               |      WHEN 2 THEN 'nan'
               |      ELSE NULL END""".stripMargin)},
            |parsed AS (SELECT event_id, $ParsedStrArr AS p FROM rep),
            |cl AS (SELECT event_id,
            |  list_sort(list_distinct(
            |    list_filter(list_transform(p, x -> lower(trim(x))), x -> x IS NOT NULL AND x <> ''))) AS c
            |  FROM parsed)
            |SELECT event_id,
            |  array_to_string(CASE WHEN len(c) > 0 THEN c ELSE NULL END, '|') AS tags,
            |  CAST(CASE WHEN c IS NULL OR len(c) = 0 THEN 0 ELSE len(c) END AS INT) AS n_tags
            |FROM cl""".stripMargin))

  /** F8 tags-as-objects: the 3-way coalesce(label, slug, id) with
    * Python-truthiness fallthrough — incl. the whitespace-only label
    * that is selected then dropped (not replaced by the slug). */
  val q72TagObjects = GQuery(
    "q72_tag_objects",
    (s, d) => {
      import s.implicits._
      val m = $"event_id" % 4
      val raw = when(m === 0,
          format_string("[{'label': 'L%d', 'slug': 's%d'}]", $"user_id" % 5, $"event_id" % 9))
        .when(m === 1,
          format_string("[{'slug': 's%d'}, {'id': '%d'}]", $"user_id" % 5, $"event_id"))
        .when(m === 2, format_string("[{'label': ' '}, {'slug': 's%d'}]", $"user_id" % 5))
        .otherwise(lit("[]"))
      // Empty list → null on the wire (DuckDB's array_to_string maps
      // empty→NULL where Spark's array_join maps empty→''); the 0-count
      // is still pinned by n_labels.
      Tables.events(s, d)
        .withColumn("labels", Normalize.tagObjectLabels(raw))
        .select($"event_id",
          when(size($"labels") > 0, array_join($"labels", "|")).as("labels"),
          Normalize.sizeOrZero($"labels").as("n_labels"))
    },
    Some(s"""WITH ${repCte(
             """CASE CAST(event_id % 4 AS INT)
               |      WHEN 0 THEN printf('[{''label'': ''L%d'', ''slug'': ''s%d''}]', user_id % 5, event_id % 9)
               |      WHEN 1 THEN printf('[{''slug'': ''s%d''}, {''id'': ''%d''}]', user_id % 5, event_id)
               |      WHEN 2 THEN printf('[{''label'': '' ''}, {''slug'': ''s%d''}]', user_id % 5)
               |      ELSE '[]' END""".stripMargin)},
            |parsed AS (SELECT event_id,
            |  CASE WHEN s IS NULL OR NOT json_valid(r) OR json_type(r) <> 'ARRAY' THEN NULL
            |       ELSE from_json(r, '[{"label":"VARCHAR","slug":"VARCHAR","id":"VARCHAR"}]') END AS p
            |  FROM rep),
            |lab AS (SELECT event_id,
            |  list_filter(
            |    list_transform(p, x -> nullif(trim(coalesce(
            |      nullif(x.label, ''), nullif(x.slug, ''), nullif(x.id, ''))), '')),
            |    x -> x IS NOT NULL) AS l
            |  FROM parsed)
            |SELECT event_id,
            |  array_to_string(CASE WHEN len(l) > 0 THEN l ELSE NULL END, '|') AS labels,
            |  CAST(coalesce(len(l), 0) AS INT) AS n_labels
            |FROM lab""".stripMargin))

  /** F10 series-id extraction: object-or-list polymorphic field →
    * distinct id set (here with per-id occurrence counts so the compare
    * also pins the multiplicity the distinct collapsed). */
  val q73SeriesIds = GQuery(
    "q73_series_ids",
    (s, d) => {
      import s.implicits._
      val m = $"event_id" % 5
      val u20 = $"user_id" % 20
      val raw = when(m === 0, format_string("{'id': 'ser-%d'}", u20))
        .when(m === 1,
          format_string("[{'id': 'ser-%d'}, {'id': 'ser-%d'}]", u20, ($"user_id" + 7) % 20))
        .when(m === 2, lit("[]"))
        .when(m === 3, lit("nan"))
        .otherwise(lit(null).cast("string"))
      Tables.events(s, d)
        .select(explode(Normalize.seriesIds(raw)).as("series_id"))
        .groupBy($"series_id")
        .agg(count(lit(1)).as("n_events"))
    },
    Some(s"""WITH ${repCte(
             """CASE CAST(event_id % 5 AS INT)
               |      WHEN 0 THEN printf('{''id'': ''ser-%d''}', user_id % 20)
               |      WHEN 1 THEN printf('[{''id'': ''ser-%d''}, {''id'': ''ser-%d''}]', user_id % 20, (user_id + 7) % 20)
               |      WHEN 2 THEN '[]'
               |      WHEN 3 THEN 'nan'
               |      ELSE NULL END""".stripMargin)},
            |ids AS (SELECT event_id,
            |  CASE WHEN s IS NULL OR NOT json_valid(r) THEN NULL
            |       WHEN json_type(r) = 'ARRAY' THEN list_transform(from_json(r, '[{"id":"VARCHAR"}]'), x -> x.id)
            |       WHEN json_type(r) = 'OBJECT' THEN [json_extract_string(r, '$$.id')]
            |       ELSE NULL END AS sids
            |  FROM rep)
            |SELECT sid AS series_id, count(*) AS n_events
            |FROM (SELECT unnest(list_filter(sids, x -> x IS NOT NULL AND trim(x) <> '')) AS sid FROM ids)
            |GROUP BY sid""".stripMargin))

  /** F11 lenient timestamp parse end-to-end: ISO datetime, date-only,
    * 'T'-separated, garbage → null (pandas errors='coerce' ≈ Spark
    * try_to_timestamp ≈ DuckDB TRY_CAST for these shapes — the three
    * engines agree on exactly this format family, which is why the
    * synthesis sticks to it). */
  val q78TimestampLenient = GQuery(
    "q78_ts_lenient",
    (s, d) => {
      import s.implicits._
      val m = $"event_id" % 5
      val tsStr = when(m === 0, date_format($"ts", "yyyy-MM-dd HH:mm:ss"))
        .when(m === 1, date_format($"ts", "yyyy-MM-dd"))
        .when(m === 2, date_format($"ts", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(m === 3, lit("not a timestamp"))
        .otherwise(lit(null).cast("string"))
      Tables.events(s, d)
        .withColumn("s", tsStr)
        .withColumn("parsed", Normalize.timestampLenient($"s"))
        .agg(
          count($"parsed").as("n_parsed"),
          count(when($"parsed".isNull && $"s".isNotNull, 1)).as("n_failed"),
          date_format(min($"parsed"), "yyyy-MM-dd HH:mm:ss").as("min_ts"),
          date_format(max($"parsed"), "yyyy-MM-dd HH:mm:ss").as("max_ts"))
    },
    Some("""WITH src AS (SELECT CASE CAST(event_id % 5 AS INT)
           |    WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
           |    WHEN 1 THEN strftime(ts, '%Y-%m-%d')
           |    WHEN 2 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
           |    WHEN 3 THEN 'not a timestamp'
           |    ELSE NULL END AS s FROM events),
           |p AS (SELECT s, TRY_CAST(s AS TIMESTAMP) AS parsed FROM src)
           |SELECT count(parsed) AS n_parsed,
           |  count(*) FILTER (WHERE parsed IS NULL AND s IS NOT NULL) AS n_failed,
           |  strftime(min(parsed), '%Y-%m-%d %H:%M:%S') AS min_ts,
           |  strftime(max(parsed), '%Y-%m-%d %H:%M:%S') AS max_ts
           |FROM p""".stripMargin))

  /** The composed silver pipeline (Cleaner.cleanEvents: P3 pk filter →
    * P8 sentinel nulls → W1 latest-per-key dedup → F15/F16 fills)
    * oracle-verified end-to-end. The raw events table is clean, so the
    * query plants its own dirt deterministically: a NEWER duplicate per
    * event_id%10==0 carrying sentinel event_type/props and a null value
    * (it must WIN the dedup, proving sentinel→null→default-fill), and a
    * null-pk row per event_id%17==0 (dropped by the pk filter). */
  /** Deterministically dirtied events corpus shared by q79/q93: a
    * NEWER sentinel-laden duplicate per event_id%10==0 and a null-pk
    * row per event_id%17==0 (mirrored verbatim in their oracles). */
  private def dirtyEvents(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val dirtyWin = ev.filter($"event_id" % 10 === 0).select(
      $"event_id", ($"ts" + expr("INTERVAL 1 HOUR")).as("ts"), $"user_id",
      lit("NaN").as("event_type"), lit(null).cast("double").as("value"),
      lit(" ").as("props"))
    val orphan = ev.filter($"event_id" % 17 === 0).select(
      lit(null).cast("long").as("event_id"), $"ts", $"user_id",
      $"event_type", $"value", $"props")
    ev.unionByName(dirtyWin).unionByName(orphan)
  }

  /** The dirty corpus as a DuckDB CTE body. */
  private val DirtyEventsSql: String =
    """SELECT event_id, ts, user_id, event_type, value, props FROM events
      |  UNION ALL
      |  SELECT event_id, ts + INTERVAL 1 HOUR, user_id, 'NaN', NULL, ' '
      |  FROM events WHERE event_id % 10 = 0
      |  UNION ALL
      |  SELECT NULL, ts, user_id, event_type, value, props
      |  FROM events WHERE event_id % 17 = 0""".stripMargin

  val q79SilverPipeline = GQuery(
    "q79_silver_pipeline",
    (s, d) => {
      import s.implicits._
      val cleaned = graft.clean.Cleaner.cleanEvents(dirtyEvents(s, d))
      cleaned.agg(
        count(lit(1)).as("n_rows"),
        count(when($"event_type" === "unknown", 1)).as("n_unknown"),
        count(when($"props" === "{}", 1)).as("n_props_default"),
        round(sum($"value"), 2).as("sum_value"))
    },
    Some {
      val sent = Normalize.NullSentinels.map(x => s"'$x'").mkString(", ")
      s"""WITH dirty AS (
         |  $DirtyEventsSql),
         |pk AS (SELECT * FROM dirty WHERE event_id IS NOT NULL),
         |norm AS (SELECT event_id, ts, value,
         |    CASE WHEN lower(trim(event_type)) IN ($sent) THEN NULL ELSE event_type END AS event_type,
         |    CASE WHEN lower(trim(props)) IN ($sent) THEN NULL ELSE props END AS props
         |  FROM pk),
         |dedup AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM norm) WHERE rn = 1),
         |filled AS (SELECT coalesce(event_type, 'unknown') AS event_type,
         |    coalesce(props, '{}') AS props, coalesce(value, 0.0) AS value
         |  FROM dedup)
         |SELECT count(*) AS n_rows,
         |  count(*) FILTER (WHERE event_type = 'unknown') AS n_unknown,
         |  count(*) FILTER (WHERE props = '{}') AS n_props_default,
         |  round(sum(value), 2) AS sum_value
         |FROM filled""".stripMargin
    })

  /** S1/S2/S3 promoted to oracle-verified: a deterministic JSONL
    * snapshot of events (sorted, first 500 — driver-side fixture
    * setup, not an operator) is re-ingested through the DSv2
    * `graft-paged` source (one InputPartition per page, planning-time
    * stop-on-empty probe) and parsed via from_json; the oracle
    * aggregates the same 500 source rows directly. Doubles round-trip
    * JSON losslessly (shortest-repr write, exact parse). */
  val q81PagedSource = GQuery(
    "q81_paged_source",
    (s, d) => {
      import s.implicits._
      val rows = Tables.events(s, d).orderBy($"event_id").limit(500)
        .select(to_json(struct($"event_id", $"event_type", $"value")).as("j"))
        .collect().map(_.getString(0))
      val f = java.nio.file.Files.createTempFile("graft_paged_q81", ".jsonl")
      f.toFile.deleteOnExit() // dev loops re-run this hundreds of times
      java.nio.file.Files.write(f, rows.mkString("\n").getBytes("UTF-8"))
      s.read.format("graft-paged")
        .option("path", f.toString).option("pageSize", "64")
        .load()
        .select(from_json($"json",
          lit("event_id bigint, event_type string, value double")).as("r"))
        .select($"r.*")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total"))
    },
    Some("""SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
           |FROM (SELECT * FROM events ORDER BY event_id LIMIT 500)
           |GROUP BY event_type""".stripMargin))

  /** S11-style per-column null profiling (one aggregation pass per
    * table, unpivoted) over the dirty corpus so the counts are
    * provably nonzero where dirt was planted and zero elsewhere. */
  val q93NullProfile = GQuery(
    "q93_null_profile",
    (s, d) => graft.io.Volumetry.nullProfile(dirtyEvents(s, d)),
    Some {
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      val rows = cols.map(c =>
        s"SELECT '$c' AS column_name, count(*) FILTER (WHERE $c IS NULL) AS n_nulls FROM dirty")
      s"""WITH dirty AS (
         |  $DirtyEventsSql)
         |${rows.mkString("\n|UNION ALL ")}""".stripMargin
    })

  /** q171 — try_* ANSI-safety surface: with ANSI mode ON (Spark 4
    * default) plain division/casts THROW on zero/garbage, so the
    * try_divide / try_cast / try_add family is how production
    * pipelines stay total. Inputs are derived deterministically from
    * events (a zero denominator every 7th row, an unparsable numeric
    * string every 3rd); the oracle reproduces each null with DuckDB's
    * TRY_CAST / CASE-guarded division — same nulls, same survivors.
    */
  val q171TryFunctions = GQuery(
    "q171_try_functions",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("den", when($"event_id" % 7 === 0, 0.0).otherwise(2.0))
        .withColumn("numish",
          when($"event_id" % 3 === 0, lit("oops")).otherwise($"event_id".cast("string")))
        .select($"event_type",
          expr("try_divide(value, den)").as("ratio"),
          expr("try_cast(numish AS BIGINT)").as("parsed"),
          expr("try_add(9223372036854775807L, event_id)").as("overflowed"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          count(when($"ratio".isNull, 1)).as("null_ratio"),
          count(when($"parsed".isNull, 1)).as("null_parsed"),
          count(when($"overflowed".isNull, 1)).as("null_overflow"),
          round(sum($"ratio"), 2).as("sum_ratio"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
           |  count(*) FILTER (WHERE ratio IS NULL) AS null_ratio,
           |  count(*) FILTER (WHERE parsed IS NULL) AS null_parsed,
           |  count(*) FILTER (WHERE overflowed IS NULL) AS null_overflow,
           |  round(sum(ratio), 2) AS sum_ratio
           |FROM (
           |  SELECT event_type,
           |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value / 2.0 END AS ratio,
           |    TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'oops'
           |                  ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS parsed,
           |    CASE WHEN event_id > 0 THEN NULL
           |         ELSE 9223372036854775807 + event_id END AS overflowed
           |  FROM events)
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  val all: Seq[GQuery] = Seq(
    q69NormalizePrices, q70NormalizeOutcomes, q71ParseTags, q72TagObjects, q73SeriesIds,
    q78TimestampLenient, q79SilverPipeline, q81PagedSource, q93NullProfile,
    q171TryFunctions)
}
