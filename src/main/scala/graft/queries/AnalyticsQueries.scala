package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second analytics batch: interval-overlap concurrency (two-phase
  * sweep line), GROUPING SETS, hopping windows, distribution
  * entropy/mode, quantile-bound RFM segmentation, and a chi-square
  * independence test. Design rules as everywhere in this repo: no
  * global windows (day-partitioned cumsums + tiny broadcast offsets),
  * totals ride broadcast joins, set-membership thresholds are
  * quantized before comparison, and only post-aggregation doubles are
  * rounded.
  */
object AnalyticsQueries {

  /** q124 — max concurrent 5-minute event intervals per type, by sweep
    * line: +1/−1 boundary points, cumulative sum. Scale shape: the
    * running sum is partitioned by (type, day); cross-day continuity
    * comes from a per-day prefix-offset table (≤ days×types rows,
    * broadcast) — the classic two-phase prefix sum, so no partition
    * ever holds more than a day of one type. Ties order (t, delta):
    * −1 before +1 at the same instant = half-open [ts, ts+5m)
    * intervals; rows identical in (t, delta) yield the same running-sum
    * multiset in any order, so the max is deterministic.
    */
  val q124MaxConcurrency = GQuery(
    "q124_max_concurrency",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val pts = ev.select($"event_type", $"ts".as("t"), lit(1).as("delta"))
        .unionByName(ev.select($"event_type",
          ($"ts" + expr("INTERVAL 5 MINUTES")).as("t"), lit(-1).as("delta")))
        .withColumn("day", to_date($"t"))
      val daily = pts.groupBy($"event_type", $"day").agg(sum($"delta").as("net"))
      val wDays = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = daily
        .withColumn("off", coalesce(sum($"net").over(wDays), lit(0L)))
        .select($"event_type", $"day", $"off")
      val wIn = Window.partitionBy($"event_type", $"day").orderBy($"t", $"delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pts.withColumn("run", sum($"delta").over(wIn))
        .join(broadcast(offsets), Seq("event_type", "day"))
        .groupBy($"event_type")
        .agg(max($"off" + $"run").as("max_concurrent"),
          count(lit(1)).as("n_boundaries"))
        .orderBy($"event_type")
    },
    Some("""WITH pts AS (
           |  SELECT event_type, ts AS t, 1 AS delta FROM events
           |  UNION ALL
           |  SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS delta FROM events),
           |wd AS (SELECT event_type, CAST(t AS DATE) AS day, t, delta FROM pts),
           |daily AS (SELECT event_type, day, CAST(sum(delta) AS BIGINT) AS net
           |          FROM wd GROUP BY event_type, day),
           |offs AS (SELECT event_type, day,
           |           COALESCE(CAST(sum(net) OVER (PARTITION BY event_type ORDER BY day
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
           |         FROM daily),
           |runs AS (SELECT event_type, day,
           |           CAST(sum(delta) OVER (PARTITION BY event_type, day ORDER BY t, delta
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
           |         FROM wd)
           |SELECT r.event_type, CAST(max(o.off + r.run) AS BIGINT) AS max_concurrent,
           |       count(*) AS n_boundaries
           |FROM runs r JOIN offs o ON r.event_type = o.event_type AND r.day = o.day
           |GROUP BY r.event_type ORDER BY r.event_type""".stripMargin))

  /** q125 — GROUPING SETS: the explicit-grain sibling of q59 ROLLUP /
    * q89 CUBE, completing the grouping-sets surface (SURVEY §2.4). The
    * (segment, priority), (segment), () grains compute in one shuffle;
    * grouping() flags disambiguate real NULL keys from subtotal rows.
    */
  val q125GroupingSets = GQuery(
    "q125_grouping_sets",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderpriority", $"o_totalprice")
        .createOrReplaceTempView("q125_in")
      s.sql("""SELECT c_mktsegment, o_orderpriority,
              |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders,
              |  grouping(c_mktsegment) AS g_seg, grouping(o_orderpriority) AS g_pri
              |FROM q125_in
              |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority), (c_mktsegment), ())
              |""".stripMargin)
    },
    Some("""SELECT c_mktsegment, o_orderpriority,
           |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders,
           |  CAST(grouping(c_mktsegment) AS TINYINT) AS g_seg,
           |  CAST(grouping(o_orderpriority) AS TINYINT) AS g_pri
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority), (c_mktsegment), ())""".stripMargin))

  /** q126 — hopping (sliding) window aggregation: 1-hour windows every
    * 15 minutes, so each event lands in exactly 4 windows. Spark's
    * `window()` generates the assignment at the scan (no join); the
    * oracle derives the same 4 epoch-aligned starts arithmetically.
    */
  val q126HoppingWindow = GQuery(
    "q126_hopping_window",
    (s, d) => {
      import s.implicits._
      // Same window assignment as `window($"ts", "1 hour", "15 minutes")`
      // but as LONG microsecond arithmetic: the built-in form expands a
      // ~40-node struct(start,end) expression tree PER SLOT (4 slots,
      // each re-deriving the slide-aligned base with its own
      // precisetimestampconversion chain) and then hash-aggregates on
      // the 16-byte struct key (plans/r17/q126_hopping_window_before
      // .txt node 4). Here the slide base is computed once per row,
      // the 4 starts are base − k·slide (pmod matches the built-in's
      // negative-timestamp adjustment), the group key is one long, and
      // date_format runs on the aggregated rows only. Groups and
      // members are identical, so n/sum_v are unchanged.
      val slideUs = 900000000L // 15 min
      val e = unix_micros($"ts")
      val base = (e - pmod(e, lit(slideUs))).as("base")
      Tables.events(s, d)
        .where($"ts".isNotNull)
        .select($"event_type", $"value", base)
        .select($"event_type", $"value", explode(array(
          $"base", $"base" - slideUs, $"base" - 2 * slideUs,
          $"base" - 3 * slideUs)).as("ws_us"))
        .groupBy($"ws_us", $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_v"))
        .select(date_format(timestamp_micros($"ws_us"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          $"event_type", $"n", $"sum_v")
        .orderBy($"ws", $"event_type")
    },
    Some("""WITH ks AS (SELECT unnest(range(0, 4)) AS k),
           |w AS (SELECT event_type, value,
           |        make_timestamp(((epoch_us(ts) // 1000000 // 900 - k) * 900) * 1000000) AS wst
           |      FROM events CROSS JOIN ks),
           |g AS (SELECT wst, event_type, count(*) AS n, round(sum(value), 4) AS sum_v
           |      FROM w GROUP BY wst, event_type)
           |SELECT strftime(wst, '%Y-%m-%d %H:%M:%S') AS ws, event_type, n, sum_v
           |FROM g ORDER BY ws, event_type""".stripMargin),
    benchmark = true)

  /** q127 — distribution shape per event type: Shannon entropy of the
    * 10-bin value histogram plus the modal bin (ties → smallest bin).
    * Bin edges are the q107-style shared IEEE expression; probabilities
    * are int÷int quotients; only the final entropy is rounded.
    */
  val q127EntropyMode = GQuery(
    "q127_entropy_mode",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val stats = ev.agg(min($"value").as("lo"), max($"value").as("hi"))
      val cells = ev.crossJoin(broadcast(stats))
        .withColumn("bin",
          least(floor(($"value" - $"lo") / (($"hi" - $"lo") / 10.0)), lit(9.0)).cast("int"))
        .groupBy($"event_type", $"bin").agg(count(lit(1)).as("n"))
      val tot = cells.groupBy($"event_type").agg(sum($"n").as("tot"))
      val ent = cells.join(broadcast(tot), "event_type")
        .withColumn("p", $"n".cast("double") / $"tot".cast("double"))
        .groupBy($"event_type")
        .agg(round(-sum($"p" * log($"p")), 6).as("entropy"))
      val mx = cells.groupBy($"event_type").agg(max($"n").as("mode_n"))
      val mode = cells.join(broadcast(mx), "event_type")
        .where($"n" === $"mode_n")
        .groupBy($"event_type")
        .agg(min($"bin").as("mode_bin"), max($"mode_n").as("mode_n"))
      ent.join(mode, "event_type").orderBy($"event_type")
    },
    Some("""WITH stats AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
           |cells AS (
           |  SELECT event_type,
           |         CAST(least(floor((value - lo) / ((hi - lo) / 10.0)), 9.0) AS INT) AS bin,
           |         count(*) AS n
           |  FROM events CROSS JOIN stats
           |  GROUP BY event_type, bin),
           |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM cells GROUP BY event_type),
           |ent AS (SELECT c.event_type,
           |          round(-sum((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) *
           |                     ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))), 6) AS entropy
           |        FROM cells c JOIN tot USING (event_type) GROUP BY c.event_type),
           |mx AS (SELECT event_type, CAST(max(n) AS BIGINT) AS mode_n FROM cells GROUP BY event_type),
           |md AS (SELECT c.event_type, min(bin) AS mode_bin, max(m.mode_n) AS mode_n
           |       FROM cells c JOIN mx m ON c.event_type = m.event_type AND c.n = m.mode_n
           |       GROUP BY c.event_type)
           |SELECT e.event_type, entropy, mode_bin, mode_n
           |FROM ent e JOIN md USING (event_type) ORDER BY event_type""".stripMargin))

  /** q128 — RFM segmentation via broadcast quantile bounds, not
    * ntile: a global ntile(5) would sort every customer through one
    * ordering; instead the four quintile bounds per metric are
    * computed once (one aggregate row, broadcast) and each customer
    * scores 1–5 by comparisons. Bounds are 6dp-quantized before any
    * comparison (set membership must not hinge on cross-engine
    * interpolation ULPs).
    */
  val q128RfmSegmentation = GQuery(
    "q128_rfm_segments",
    (s, d) => {
      import s.implicits._
      val cust = Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(
          datediff(lit("2001-08-02").cast("date"), max($"o_orderdate").cast("date")).as("r"),
          count(lit(1)).as("f"),
          sum($"o_totalprice").as("m"))
      val boundCols = Seq(0.2, 0.4, 0.6, 0.8).zipWithIndex.flatMap { case (q, i) =>
        Seq("r", "f", "m").map(v =>
          round(expr(s"percentile($v, ${q}D)"), 6).as(s"$v${i + 1}"))
      }
      val bounds = cust.agg(boundCols.head, boundCols.tail: _*)
      def score(v: String) =
        (1 to 4).map(i => (col(v) > col(s"$v$i")).cast("int")).reduce(_ + _) + 1
      cust.crossJoin(broadcast(bounds))
        .select(concat(score("r").cast("string"), score("f").cast("string"),
          score("m").cast("string")).as("segment"), $"m")
        .groupBy($"segment")
        // sum, not avg: o_totalprice carries 2 decimals, so the segment
        // sum is decimal-exact at 2dp and round() can't land on a .xx5
        // half-way point — an avg divides by n and regularly does,
        // where Spark (decimal HALF_UP) and DuckDB (binary) disagree
        .agg(count(lit(1)).as("n_custs"), round(sum($"m"), 2).as("sum_monetary"))
        .orderBy($"segment")
    },
    Some("""WITH cust AS (
           |  SELECT o_custkey,
           |         date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-08-02') AS r,
           |         count(*) AS f, sum(o_totalprice) AS m
           |  FROM orders GROUP BY o_custkey),
           |b AS (SELECT
           |  round(quantile_cont(r, 0.2), 6) AS r1, round(quantile_cont(r, 0.4), 6) AS r2,
           |  round(quantile_cont(r, 0.6), 6) AS r3, round(quantile_cont(r, 0.8), 6) AS r4,
           |  round(quantile_cont(f, 0.2), 6) AS f1, round(quantile_cont(f, 0.4), 6) AS f2,
           |  round(quantile_cont(f, 0.6), 6) AS f3, round(quantile_cont(f, 0.8), 6) AS f4,
           |  round(quantile_cont(m, 0.2), 6) AS m1, round(quantile_cont(m, 0.4), 6) AS m2,
           |  round(quantile_cont(m, 0.6), 6) AS m3, round(quantile_cont(m, 0.8), 6) AS m4
           |  FROM cust),
           |scored AS (
           |  SELECT ((r > r1)::INT + (r > r2)::INT + (r > r3)::INT + (r > r4)::INT + 1) AS rs,
           |         ((f > f1)::INT + (f > f2)::INT + (f > f3)::INT + (f > f4)::INT + 1) AS fs,
           |         ((m > m1)::INT + (m > m2)::INT + (m > m3)::INT + (m > m4)::INT + 1) AS ms,
           |         m
           |  FROM cust CROSS JOIN b)
           |SELECT CAST(rs AS VARCHAR) || CAST(fs AS VARCHAR) || CAST(ms AS VARCHAR) AS segment,
           |       count(*) AS n_custs, round(sum(m), 2) AS sum_monetary
           |FROM scored GROUP BY segment ORDER BY segment""".stripMargin))

  /** q129 — chi-square test of independence between order priority and
    * order status: observed vs expected cell counts from broadcast
    * marginals. Expected counts are the identical double expression in
    * both engines; the statistic is rounded post-aggregation only.
    */
  val q129ChiSquare = GQuery(
    "q129_chi_square",
    (s, d) => {
      import s.implicits._
      val obs = Tables.orders(s, d)
        .groupBy($"o_orderpriority".as("pr"), $"o_orderstatus".as("st"))
        .agg(count(lit(1)).as("n"))
      val rowt = obs.groupBy($"pr").agg(sum($"n").as("rt"))
      val colt = obs.groupBy($"st").agg(sum($"n").as("ct"))
      val tot = obs.agg(sum($"n").as("tot"))
      obs.join(broadcast(rowt), "pr").join(broadcast(colt), "st")
        .crossJoin(broadcast(tot))
        .withColumn("e", $"rt".cast("double") * $"ct".cast("double") / $"tot".cast("double"))
        .agg(round(sum(($"n" - $"e") * ($"n" - $"e") / $"e"), 4).as("chi2"),
          countDistinct($"pr").as("n_pr"), countDistinct($"st").as("n_st"))
        .select($"chi2", (($"n_pr" - 1) * ($"n_st" - 1)).as("dof"))
    },
    Some("""WITH obs AS (SELECT o_orderpriority AS pr, o_orderstatus AS st, count(*) AS n
           |             FROM orders GROUP BY pr, st),
           |rowt AS (SELECT pr, CAST(sum(n) AS BIGINT) AS rt FROM obs GROUP BY pr),
           |colt AS (SELECT st, CAST(sum(n) AS BIGINT) AS ct FROM obs GROUP BY st),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM obs)
           |SELECT round(sum((n - e) * (n - e) / e), 4) AS chi2,
           |       (count(DISTINCT pr) - 1) * (count(DISTINCT st) - 1) AS dof
           |FROM (SELECT n, pr, st,
           |        CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tot AS DOUBLE) AS e
           |      FROM obs JOIN rowt USING (pr) JOIN colt USING (st) CROSS JOIN tot)""".stripMargin))

  /** q139 — grid-blocked spatial self-join: customers get deterministic
    * hash-derived coordinates in a 10°×10° region (lat 40–50), and the
    * query finds all pairs within 50 km by great-circle (haversine)
    * distance. Blocking: each point lands in a 1° grid cell (≥71 km
    * wide at these latitudes, so a 50 km pair is always in the same or
    * an adjacent cell); one side explodes to its 3×3 cell neighborhood
    * and pairs meet on an equi-join over the cell id — never an
    * all-pairs cross join. `ka < kb` dedups (the probe's 9 cells are
    * distinct, the build point's home cell unique). Distances are
    * 4dp-quantized before the ≤50 km membership test (libm sin/cos may
    * differ by an ULP across engines).
    */
  val q139SpatialGridJoin = GQuery(
    "q139_spatial_grid_join",
    (s, d) => {
      import s.implicits._
      import graft.functions.TextAnalysis.tokenHash60
      val pts = Tables.customer(s, d).select(
        $"c_custkey".as("k"),
        (lit(40.0) + (tokenHash60(concat($"c_custkey".cast("string"), lit("-lat")))
          % 100000) / 10000.0).as("lat"),
        ((tokenHash60(concat($"c_custkey".cast("string"), lit("-lon")))
          % 100000) / 10000.0).as("lon"))
      val cells = pts
        .withColumn("cx", floor($"lat").cast("long"))
        .withColumn("cy", floor($"lon").cast("long"))
      val probe = cells
        .select($"k".as("ka"), $"lat".as("la1"), $"lon".as("lo1"), $"cx", $"cy",
          explode(array(lit(-1L), lit(0L), lit(1L))).as("dx"))
        .select($"ka", $"la1", $"lo1", $"cx", $"cy", $"dx",
          explode(array(lit(-1L), lit(0L), lit(1L))).as("dy"))
        .select($"ka", $"la1", $"lo1",
          ($"cx" + $"dx").as("px"), ($"cy" + $"dy").as("py"))
      val build = cells.select($"k".as("kb"), $"lat".as("la2"), $"lon".as("lo2"),
        $"cx", $"cy")
      def sq(c: Column): Column = c * c
      val dist = round(lit(2.0) * 6371.0 * asin(sqrt(
        sq(sin(radians($"la2" - $"la1") / 2.0)) +
          cos(radians($"la1")) * cos(radians($"la2")) *
            sq(sin(radians($"lo2" - $"lo1") / 2.0)))), 4)
      probe.join(build,
          $"px" === $"cx" && $"py" === $"cy" && $"ka" < $"kb")
        .withColumn("dist", dist)
        .where($"dist" <= 50.0)
        .groupBy(floor($"la1").cast("int").as("band"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg($"dist"), 4).as("avg_km"),
          round(min($"dist"), 4).as("min_km"))
        .orderBy($"band")
    },
    Some("""WITH pts AS (
           |  SELECT c_custkey AS k,
           |         40.0 + (CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || '-lat'), 1, 15) AS BIGINT)
           |                 % 100000) / 10000.0 AS lat,
           |         (CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || '-lon'), 1, 15) AS BIGINT)
           |          % 100000) / 10000.0 AS lon
           |  FROM customer),
           |cells AS (SELECT k, lat, lon, CAST(floor(lat) AS BIGINT) AS cx,
           |                 CAST(floor(lon) AS BIGINT) AS cy FROM pts),
           |probe AS (SELECT k AS ka, lat AS la1, lon AS lo1, cx + dx.dx AS px, cy + dy.dy AS py
           |          FROM cells,
           |               (SELECT unnest([-1, 0, 1]) AS dx) dx,
           |               (SELECT unnest([-1, 0, 1]) AS dy) dy),
           |cand AS (SELECT ka, b.k AS kb, la1, lo1, b.lat AS la2, b.lon AS lo2
           |         FROM probe a JOIN cells b ON a.px = b.cx AND a.py = b.cy AND a.ka < b.k),
           |dd AS (SELECT la1,
           |         round(2.0 * 6371.0 * asin(sqrt(
           |           sin(radians(la2 - la1) / 2.0) * sin(radians(la2 - la1) / 2.0) +
           |           cos(radians(la1)) * cos(radians(la2)) *
           |           sin(radians(lo2 - lo1) / 2.0) * sin(radians(lo2 - lo1) / 2.0))), 4) AS dist
           |       FROM cand)
           |SELECT CAST(floor(la1) AS INT) AS band, count(*) AS n_pairs,
           |       round(avg(dist), 4) AS avg_km, round(min(dist), 4) AS min_km
           |FROM dd WHERE dist <= 50.0
           |GROUP BY band ORDER BY band""".stripMargin))

  /** q162 — map-type + map-HOF surface: per event type, a
    * bucket→count map built with map_from_entries over a SORTED entry
    * array (map entry order is construction order — sorting first
    * makes the serialized form deterministic), then consumed through
    * the map higher-order functions: map_filter (hot buckets),
    * aggregate over map_values (total), and map_entries→transform→
    * array_join (the canonical "no complex types on the compare wire"
    * serialization). The map never exceeds 10 keys — groupBy first,
    * collect after, so the collect_list is bounded by the bucket
    * cardinality, not the row count.
    */
  val q162MapFunctions = GQuery(
    "q162_map_functions",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("bucket", ($"user_id" % 10).cast("int"))
        .groupBy($"event_type", $"bucket").agg(count(lit(1)).as("n"))
        .groupBy($"event_type")
        .agg(map_from_entries(array_sort(collect_list(struct($"bucket", $"n"))))
          .as("m"))
        .select($"event_type",
          size($"m").as("n_keys"),
          size(map_filter($"m", (_, v) => v > 100)).as("n_hot"),
          aggregate(map_values($"m"), lit(0L), (a, x) => a + x).as("total"),
          array_join(transform(map_entries($"m"), e =>
            concat(e.getField("key").cast("string"), lit(":"),
              e.getField("value").cast("string"))), "|").as("hist"))
        .orderBy($"event_type")
    },
    Some("""WITH b AS (
           |  SELECT event_type, CAST(user_id % 10 AS INT) AS bucket, count(*) AS n
           |  FROM events GROUP BY event_type, bucket)
           |SELECT event_type, count(*) AS n_keys,
           |       count(*) FILTER (WHERE n > 100) AS n_hot,
           |       CAST(sum(n) AS BIGINT) AS total,
           |       string_agg(bucket || ':' || n, '|' ORDER BY bucket) AS hist
           |FROM b GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** q165 — top-k per key through the engine's own PHYSICAL operator
    * (graft.plans.TopKPerKey: custom LogicalPlan + planner Strategy +
    * exec node with bounded per-key heaps — O(k) memory per key where
    * the window row_number form sorts every group in full). The oracle
    * is that window form in DuckDB, so the green row doubles as the
    * operator==window equivalence proof at data scale;
    * TopKStrategySpec pins plan shape and the heap's eviction edges.
    */
  val q165TopkOperator = GQuery(
    "q165_topk_operator",
    (s, d) => {
      import s.implicits._
      // explicit NULL-order exclusion on BOTH sides (TopKPerKey never
      // ranks a NULL-order row; row_number would backfill them in
      // groups with < k non-null rows) — the operator==window
      // equivalence is by construction, not by fixture luck
      graft.plans.TopK.perKey(
        Tables.events(s, d).filter($"value".isNotNull),
        Seq("event_type"), "value", "event_id", 3)
        .select($"event_type", $"event_id", $"value")
        .orderBy($"event_type", $"value".desc, $"event_id")
    },
    Some("""SELECT event_type, event_id, value FROM (
           |  SELECT event_type, event_id, value,
           |         row_number() OVER (PARTITION BY event_type
           |                            ORDER BY value DESC, event_id) AS rn
           |  FROM events WHERE value IS NOT NULL) t WHERE rn <= 3
           |ORDER BY event_type, value DESC, event_id""".stripMargin),
    benchmark = true)

  val all: Seq[GQuery] = Seq(
    q124MaxConcurrency, q125GroupingSets, q126HoppingWindow,
    q127EntropyMode, q128RfmSegmentation, q129ChiSquare, q139SpatialGridJoin,
    q162MapFunctions, q165TopkOperator)
}
