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

  val all: Seq[GQuery] =
    Seq(q103ExactPercentiles, q104RegressionTrend, q105MovingZscore)
}
