package graft.queries

import graft.Tables
import graft.operators.Temporal
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators as driver-verifiable queries: event-time session
  * windows (Spark's session_window vs a gaps-and-islands oracle), the
  * keyed backward as-of join (vs DuckDB's native ASOF JOIN), and the
  * binned interval join (vs a plain BETWEEN join oracle).
  */
object TemporalQueries {

  /** Session windows (30-min gap) per user over events — Spark's
    * built-in `session_window` merges an event into the open session
    * iff ts < last_ts + gap, i.e. a new session starts at diff >= gap;
    * the islands oracle encodes exactly that boundary. Span math uses
    * whole-second boundary counts (unix_timestamp floor ≡ date_diff
    * 'second') so fractional-second timestamps cannot diverge. */
  val q85SessionWindow = GQuery(
    "q85_session_window",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum($"n").as("n_events"),
          sum(unix_timestamp($"w.end") - unix_timestamp($"w.start") - 1800L)
            .as("total_span_s"))
    },
    Some("""WITH m AS (
           |  SELECT user_id, ts,
           |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
           |         THEN 1 ELSE 0 END AS new_s
           |  FROM events),
           |i AS (SELECT user_id, ts,
           |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM m),
           |sess AS (SELECT user_id, sid, count(*) AS n,
           |  date_diff('second', min(ts), max(ts)) AS span
           |  FROM i GROUP BY user_id, sid)
           |SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events,
           |  CAST(sum(span) AS BIGINT) AS total_span_s
           |FROM sess GROUP BY user_id""".stripMargin))

  /** Keyed backward as-of join: every event picks its user's latest
    * profile checkpoint at-or-before the event time (checkpoints =
    * every 10th event, score derived deterministically). Compared
    * against DuckDB's native ASOF LEFT JOIN; the aggregate pins match
    * counts, carried scores AND the staleness (event − checkpoint)
    * seconds, so an off-by-one in the sort order cannot hide. */
  val q86AsofJoin = GQuery(
    "q86_asof_join",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val checkpoints = ev.filter($"event_id" % 10 === 0)
        .groupBy($"user_id", $"ts".as("uts"))
        .agg(max(($"event_id" % 97).cast("double") / 97.0).as("score"))
      val joined = Temporal.asofJoinBackward(
        ev.select($"event_id", $"user_id", $"ts", $"event_type"),
        checkpoints, "user_id", "ts", "uts", Seq("uts", "score"))
      joined.groupBy($"event_type").agg(
        count($"score").as("n_matched"),
        count(when($"score".isNull, 1)).as("n_unmatched"),
        round(sum($"score"), 2).as("score_sum"),
        sum(unix_timestamp($"ts") - unix_timestamp($"uts")).as("lag_s"))
    },
    Some("""WITH cp AS (
           |  SELECT user_id, ts AS uts, max(CAST(event_id % 97 AS DOUBLE) / 97.0) AS score
           |  FROM events WHERE event_id % 10 = 0 GROUP BY user_id, ts),
           |j AS (
           |  SELECT e.event_type, e.ts, cp.uts, cp.score
           |  FROM events e ASOF LEFT JOIN cp
           |  ON e.user_id = cp.user_id AND e.ts >= cp.uts)
           |SELECT event_type,
           |  count(score) AS n_matched,
           |  count(*) FILTER (WHERE score IS NULL) AS n_unmatched,
           |  round(sum(score), 2) AS score_sum,
           |  CAST(sum(date_diff('second', uts, ts)) AS BIGINT) AS lag_s
           |FROM j GROUP BY event_type""".stripMargin))

  /** Binned interval join: 50 overlapping 9-day windows (7-day stride
    * off the corpus' first day) against event timestamps — the Spark
    * side goes through the bin equi-join (never all-pairs), the oracle
    * is the plain BETWEEN join. */
  val q87RangeJoin = GQuery(
    "q87_range_join",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val anchor = ev.agg(min(date_trunc("day", $"ts"))).collect()(0).getTimestamp(0)
      val ranges = s.range(0, 50).select($"id".as("range_id"),
        expr(s"timestamp'$anchor' + make_interval(0, 0, 0, CAST(id * 7 AS INT), 0, 0, 0)").as("w_start"))
        .withColumn("w_end", expr("w_start + make_interval(0, 0, 0, 9, 0, 0, 0)"))
      Temporal.rangeJoinBinned(ev.select($"event_id", $"ts", $"value"),
          ranges, "ts", "w_start", "w_end", binSeconds = 86400L)
        .groupBy($"range_id")
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
    },
    Some("""WITH anchor AS (SELECT date_trunc('day', min(ts)) AS a FROM events),
           |ranges AS (
           |  SELECT r AS range_id,
           |    a + to_days(CAST(r * 7 AS INT)) AS w_start,
           |    a + to_days(CAST(r * 7 + 9 AS INT)) AS w_end
           |  FROM range(0, 50) t(r), anchor)
           |SELECT range_id, count(*) AS n_events, round(sum(value), 2) AS total_value
           |FROM events JOIN ranges ON ts >= w_start AND ts <= w_end
           |GROUP BY range_id""".stripMargin))

  /** Batch twin of the stream-stream attribution join
    * (Streams.attributionJoin runs unchanged on watermarked streams —
    * equivalence in StarStreamingSpec): even events trigger, odd events
    * follow within (t, t+1h], per user. */
  val q92AttributionJoin = GQuery(
    "q92_attribution_join",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val joined = graft.streaming.Streams.attributionJoin(
        ev.filter($"event_id" % 2 === 0), ev.filter($"event_id" % 2 === 1))
      joined.groupBy(($"user_id" % 10).as("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct($"t_id").as("n_triggers_matched"),
          round(sum($"f_value"), 2).as("follow_value"))
    },
    Some("""SELECT t.user_id % 10 AS bucket, count(*) AS n_pairs,
           |  count(DISTINCT t.event_id) AS n_triggers_matched,
           |  round(sum(f.value), 2) AS follow_value
           |FROM events t JOIN events f
           |  ON t.user_id = f.user_id AND t.event_id % 2 = 0 AND f.event_id % 2 = 1
           |  AND f.ts > t.ts AND f.ts <= t.ts + INTERVAL 1 HOUR
           |GROUP BY bucket""".stripMargin))

  /** Calendar gap-fill (resample): densify hourly counts per event
    * type over the full [min, max] hour span — missing hours emit 0.
    * The hour spine is `sequence(lo, hi, 1h)` (≡ DuckDB
    * generate_series) cross-joined with the type dimension; both are
    * broadcast-sized (hours × types), so the only big-side work is the
    * original aggregation. */
  val q113GapFill = GQuery(
    "q113_gap_fill",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val hourly = ev
        .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
        .agg(count(lit(1)).as("n"))
      val bounds = ev.agg(
        date_trunc("hour", min($"ts")).as("lo"),
        date_trunc("hour", max($"ts")).as("hi"))
      val spine = bounds
        .select(explode(sequence($"lo", $"hi", expr("interval 1 hour"))).as("h"))
      val types = ev.select($"event_type").distinct()
      spine.crossJoin(types)
        .join(hourly, Seq("event_type", "h"), "left")
        .select($"event_type", date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
          coalesce($"n", lit(0L)).as("n"))
        .orderBy($"event_type", $"hour")
    },
    Some("""WITH hourly AS (
           |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
           |  FROM events GROUP BY event_type, date_trunc('hour', ts)),
           |bounds AS (
           |  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
           |  FROM events),
           |spine AS (
           |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
           |types AS (SELECT DISTINCT event_type FROM events)
           |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           |       COALESCE(n, 0) AS n
           |FROM spine CROSS JOIN types
           |LEFT JOIN hourly USING (event_type, h)
           |ORDER BY event_type, hour""".stripMargin))

  /** Time-weighted average (TWAP): each observation holds until the
    * user's next event; the weight is that holding duration in µs
    * (exact integer), so the weighted sum is the only FP accumulation
    * and 4 dp rounding absorbs engine summation order. Users with a
    * single event have no held interval and drop out (sum(dur)=0 on
    * neither side — the row never exists). */
  val q114TimeWeightedAvg = GQuery(
    "q114_time_weighted_avg",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("dur_us", unix_micros(lead($"ts", 1).over(w)) - unix_micros($"ts"))
        .where($"dur_us".isNotNull)
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_held"),
          round(sum($"value" * $"dur_us".cast("double")) /
            sum($"dur_us".cast("double")), 4).as("twap"))
        .orderBy($"user_id")
    },
    Some("""WITH held AS (
           |  SELECT user_id, value,
           |         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           |           - epoch_us(ts) AS dur_us
           |  FROM events)
           |SELECT user_id, count(*) AS n_held,
           |       round(sum(value * CAST(dur_us AS DOUBLE)) /
           |             sum(CAST(dur_us AS DOUBLE)), 4) AS twap
           |FROM held WHERE dur_us IS NOT NULL
           |GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** q136 — exponentially-weighted moving average (α=0.3) of each
    * user's value series, evaluated at the last event. The recursion
    * s_i = αx_i + (1−α)s_{i−1} is re-expressed as its closed form — a
    * single weighted sum with weights (1−α)^(n−i) — so it runs as one
    * partitioned window pass plus a groupBy instead of a sequential
    * per-row loop; both engines evaluate the identical closed form.
    * Max events per user ≈ hundreds, so (0.7)^(n−1) never underflows.
    */
  val q136Ewma = GQuery(
    "q136_ewma",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wAll = Window.partitionBy($"user_id")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy($"user_id")
        .agg(
          count(lit(1)).as("n_events"),
          round(sum($"value" *
            when($"rn" === 1, pow(lit(0.7), $"n" - 1))
              .otherwise(lit(0.3) * pow(lit(0.7), $"n" - $"rn"))), 6).as("ewma"))
        .orderBy($"user_id")
    },
    Some("""WITH r AS (
           |  SELECT user_id, value,
           |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
           |         count(*) OVER (PARTITION BY user_id) AS n
           |  FROM events)
           |SELECT user_id, count(*) AS n_events,
           |       round(sum(value * CASE WHEN rn = 1 THEN pow(0.7, n - 1)
           |                              ELSE 0.3 * pow(0.7, n - rn) END), 6) AS ewma
           |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** q138 — trailing RANGE-frame burst detection: per user, the
    * maximum total value inside any [t−3600 s, t] window anchored at an
    * event. The frame is a value-range over integer epoch seconds (not
    * a row count), so ties and irregular sampling are handled exactly;
    * the window is user-partitioned — nothing global. Epoch seconds
    * floor identically in both engines (positive epochs).
    */
  val q138TrailingBurst = GQuery(
    "q138_trailing_burst",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"sec")
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        .withColumn("sec", $"ts".cast("long"))
        .withColumn("burst", sum($"value").over(w))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          round(max($"burst"), 4).as("max_burst_1h"))
        .orderBy($"user_id")
    },
    Some("""WITH b AS (
           |  SELECT user_id,
           |         sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
           |           RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS burst
           |  FROM events)
           |SELECT user_id, count(*) AS n_events,
           |       round(max(burst), 4) AS max_burst_1h
           |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** q158 — cohort retention triangle: users are assigned to the
    * cohort of their FIRST active day; each (cohort, day-offset) cell
    * reports how many of that cohort were active again offset days
    * later — the product-analytics complement of q58's hour-over-hour
    * retention. Three shuffles, all on user_id or the tiny cohort key;
    * cohort sizes broadcast back. Offsets capped at 7 to bound the
    * triangle (30-day corpus → ≤ 8 cells per cohort).
    */
  val q158CohortRetention = GQuery(
    "q158_cohort_retention",
    (s, d) => {
      import s.implicits._
      val active = Tables.events(s, d)
        .select($"user_id", to_date($"ts").as("day")).distinct()
      val first = active.groupBy($"user_id").agg(min($"day").as("cohort"))
      val sizes = first.groupBy($"cohort")
        .agg(count(lit(1)).as("cohort_size"))
      active.join(first, "user_id")
        .withColumn("day_offset", datediff($"day", $"cohort"))
        .where($"day_offset" <= 7)
        .groupBy($"cohort", $"day_offset")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "cohort")
        .select(date_format($"cohort", "yyyy-MM-dd").as("cohort"),
          $"day_offset", $"n_active",
          round($"n_active".cast("double") / $"cohort_size".cast("double"), 4)
            .as("retention"))
        .orderBy($"cohort", $"day_offset")
    },
    Some("""WITH active AS (
           |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
           |fs AS (SELECT user_id, min(day) AS cohort FROM active GROUP BY user_id),
           |sizes AS (SELECT cohort, count(*) AS cohort_size FROM fs GROUP BY cohort),
           |cells AS (
           |  SELECT f.cohort, date_diff('day', f.cohort, a.day) AS day_offset,
           |         count(*) AS n_active
           |  FROM active a JOIN fs f USING (user_id)
           |  WHERE date_diff('day', f.cohort, a.day) <= 7
           |  GROUP BY f.cohort, day_offset)
           |SELECT CAST(cohort AS VARCHAR) AS cohort, day_offset, n_active,
           |       round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 4) AS retention
           |FROM cells JOIN sizes USING (cohort)
           |ORDER BY cohort, day_offset""".stripMargin))

  /** q170 — trailing 7-day distinct actives (WAU): COUNT(DISTINCT)
    * over a sliding window, which no RANGE frame can express (window
    * functions can't dedup inside a frame). Scale-safe shape: dedup to
    * (day, user) first — the only corpus-sized pass — then each pair
    * CONTRIBUTES to its 7 trailing report days (a 7× fan-out of the
    * small deduped table, not the events), and one countDistinct per
    * report day finishes it. Report days are restricted to days that
    * exist, so the tail beyond the corpus never appears.
    */
  val q170TrailingWau = GQuery(
    "q170_trailing_wau",
    (s, d) => {
      import s.implicits._
      // NOT checkpointed, deliberately (optimization r16): the two
      // consumers' identical distinct shuffles already share one
      // exchange via ReusedExchange — a lazy localCheckpoint here
      // MEASURED ~0.15 s slower at sf0.1 (materialization barrier
      // without a recompute to save)
      val du = Tables.events(s, d)
        .select(to_date($"ts").as("day"), $"user_id").distinct()
      val contrib = du
        .select(explode(sequence(lit(0), lit(6))).as("off"), $"day", $"user_id")
        .select(date_add($"day", $"off").as("rday"), $"user_id")
      val days = du.select($"day").distinct()
      contrib.join(days, contrib("rday") === days("day"))
        .groupBy($"rday")
        .agg(countDistinct($"user_id").as("wau"))
        .select(date_format($"rday", "yyyy-MM-dd").as("day"), $"wau")
        .orderBy($"day")
    },
    Some("""WITH du AS (
           |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
           |days AS (SELECT DISTINCT day FROM du),
           |contrib AS (
           |  SELECT day + CAST(o AS INT) AS rday, user_id
           |  FROM du, range(0, 7) t(o))
           |SELECT CAST(rday AS VARCHAR) AS day,
           |       count(DISTINCT user_id) AS wau
           |FROM contrib JOIN days ON contrib.rday = days.day
           |GROUP BY rday ORDER BY day""".stripMargin),
    benchmark = true)

  val all: Seq[GQuery] = Seq(q85SessionWindow, q86AsofJoin, q87RangeJoin,
    q92AttributionJoin, q113GapFill, q114TimeWeightedAvg, q136Ewma,
    q138TrailingBurst, q158CohortRetention, q170TrailingWau)
}
