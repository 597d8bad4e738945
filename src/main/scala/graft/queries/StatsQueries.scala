package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical profiling coverage: exact quantiles, built-in linear
  * regression aggregates, and windowed anomaly scoring — the numeric
  * QA layer a curation pipeline runs over metric columns. All heavy
  * math stays in codegen'd built-in aggregates; cross-engine FP
  * noise (sum order, co-moment updates) is absorbed by post-agg
  * rounding only — no per-row arithmetic is ever rounded.
  */
object StatsQueries {

  /** Exact interpolated percentiles per group: Spark `percentile` and
    * DuckDB `quantile_cont` both define q(p) by linear interpolation at
    * rank (n−1)·p of the sorted values. */
  val q103ExactPercentiles = GQuery(
    "q103_exact_percentiles",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(value, 0.25D)"), 4).as("p25"),
          round(expr("percentile(value, 0.5D)"), 4).as("p50"),
          round(expr("percentile(value, 0.75D)"), 4).as("p75"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
           |       round(quantile_cont(value, 0.25), 4) AS p25,
           |       round(quantile_cont(value, 0.5), 4) AS p50,
           |       round(quantile_cont(value, 0.75), 4) AS p75
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Built-in regression aggregates: value trend over time per event
    * type. The regressor is re-centered to days-since-anchor BEFORE
    * aggregating — regressing on raw epoch seconds (~1.7e9 offset)
    * would put all the variance 9 orders of magnitude under the mean
    * and amplify engine-order FP noise past any rounding. */
  val q104RegressionTrend = GQuery(
    "q104_regression_trend",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("x",
          (unix_micros($"ts").cast("double") / 1000000.0 - 1704067200.0) / 86400.0)
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          round(regr_slope($"value", $"x"), 6).as("slope"),
          round(regr_intercept($"value", $"x"), 6).as("intercept"),
          round(corr($"value", $"x"), 6).as("r"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
           |       round(regr_slope(value, x), 6) AS slope,
           |       round(regr_intercept(value, x), 6) AS intercept,
           |       round(corr(value, x), 6) AS r
           |FROM (SELECT event_type, value,
           |        (epoch_us(ts) / 1000000.0 - 1704067200.0) / 86400.0 AS x
           |      FROM events)
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Moving z-score anomaly flags: hourly value totals per event type,
    * each hour scored against the trailing 24-hour window (mean ±
    * sample stddev, current row excluded). Only flagged hours ship.
    * The window is event_type-partitioned — no global ordering. */
  val q105MovingZscore = GQuery(
    "q105_moving_zscore",
    (s, d) => {
      import s.implicits._
      val hourly = Tables.events(s, d)
        .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
        .agg(sum($"value").as("v"))
      val w = Window.partitionBy($"event_type").orderBy($"h")
        .rowsBetween(-24, -1)
      hourly
        .withColumn("mu", avg($"v").over(w))
        .withColumn("sd", stddev_samp($"v").over(w))
        .where($"sd".isNotNull && $"sd" > 0)
        .withColumn("z", ($"v" - $"mu") / $"sd")
        .where(abs($"z") > 2.0)
        .select($"event_type", date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
          round($"z", 4).as("z"))
        .orderBy($"event_type", $"hour")
    },
    Some("""WITH hourly AS (
           |  SELECT event_type, date_trunc('hour', ts) AS h, sum(value) AS v
           |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
           |scored AS (
           |  SELECT event_type, h, v,
           |         avg(v) OVER w AS mu,
           |         stddev_samp(v) OVER w AS sd
           |  FROM hourly
           |  WINDOW w AS (PARTITION BY event_type ORDER BY h
           |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
           |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           |       round((v - mu) / sd, 4) AS z
           |FROM scored
           |WHERE sd IS NOT NULL AND sd > 0 AND abs((v - mu) / sd) > 2.0
           |ORDER BY event_type, hour""".stripMargin))

  /** PMI token co-occurrence: document-level presence pairs (w1 < w2)
    * scored by ln(c_xy·N / (c_x·c_y)), restricted to tokens with
    * df ≥ 50 and pairs seen ≥ 10 times. The self-join is doc-keyed and
    * vocabulary-pruned — at 100 TB the df floor keeps the pair space
    * |V|² of the SURVIVING vocabulary, not of the corpus. */
  val q106PmiCooccurrence = GQuery(
    "q106_pmi_cooccurrence",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val presence = graft.operators.Retrieval
        .termFrequencies(docs, $"doc_id", $"text")
        .select($"doc_id", $"word")
      val df = presence.groupBy($"word").agg(count(lit(1)).as("df"))
        .where($"df" >= 50)
      val kept = presence.join(broadcast(df), "word")
      val pairs = kept.select($"doc_id", $"word".as("w1"), $"df".as("df1"))
        .join(kept.select($"doc_id", $"word".as("w2"), $"df".as("df2")), "doc_id")
        .where($"w1" < $"w2")
        .groupBy($"w1", $"w2", $"df1", $"df2")
        .agg(count(lit(1)).as("c_xy"))
        .where($"c_xy" >= 10)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      pairs.crossJoin(broadcast(n))
        .select($"w1", $"w2", $"c_xy",
          round(log($"c_xy".cast("double") * $"n_docs".cast("double") /
            ($"df1".cast("double") * $"df2".cast("double"))), 4).as("pmi"))
        .orderBy($"pmi".desc, $"w1", $"w2")
        .limit(20)
    },
    Some("""WITH presence AS (
           |  SELECT DISTINCT doc_id, word FROM (
           |    SELECT doc_id,
           |           unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS word
           |    FROM documents)),
           |df AS (SELECT word, count(*) AS df FROM presence GROUP BY word HAVING count(*) >= 50),
           |kept AS (SELECT p.doc_id, p.word, df.df FROM presence p JOIN df USING (word)),
           |pairs AS (
           |  SELECT a.word AS w1, b.word AS w2, a.df AS df1, b.df AS df2, count(*) AS c_xy
           |  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.word < b.word
           |  GROUP BY a.word, b.word, a.df, b.df
           |  HAVING count(*) >= 10),
           |n AS (SELECT count(*) AS n_docs FROM documents)
           |SELECT w1, w2, c_xy,
           |       round(ln(c_xy * CAST(n_docs AS DOUBLE) / (df1 * CAST(df2 AS DOUBLE))), 4) AS pmi
           |FROM pairs CROSS JOIN n
           |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin))

  /** Equi-width histogram of events.value: 20 bins over the global
    * [min, max], computed from one broadcast stats row. The bin edges
    * are the SAME IEEE expression in both engines, so bin membership is
    * bit-deterministic — no rounding needed on the keys. */
  val q107ValueHistogram = GQuery(
    "q107_value_histogram",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val stats = ev.agg(min($"value").as("lo"), max($"value").as("hi"))
      ev.crossJoin(broadcast(stats))
        .withColumn("w", ($"hi" - $"lo") / 20.0)
        .withColumn("bin", least(floor(($"value" - $"lo") / $"w"), lit(19.0)).cast("int"))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n"), round(min($"lo") + $"bin" * min($"w"), 4).as("bin_lo"))
        .orderBy($"bin")
    },
    Some("""WITH stats AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
           |binned AS (
           |  SELECT least(floor((value - lo) / ((hi - lo) / 20.0)), 19.0)::INT AS bin,
           |         lo, (hi - lo) / 20.0 AS w
           |  FROM events CROSS JOIN stats)
           |SELECT bin, count(*) AS n, round(min(lo) + bin * min(w), 4) AS bin_lo
           |FROM binned GROUP BY bin ORDER BY bin""".stripMargin))

  val all: Seq[GQuery] =
    Seq(q103ExactPercentiles, q104RegressionTrend, q105MovingZscore,
      q106PmiCooccurrence, q107ValueHistogram)
}
