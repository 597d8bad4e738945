package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational operator coverage (SURVEY §2.2–§2.7): projection/
  * filter, conditional + grouped aggregation, semi/anti/broadcast joins,
  * window dedup, top-k, set ops, percentage-of-total, date-dimension
  * derivation. Each query pairs the Spark plan with its DuckDB oracle.
  *
  * Scale notes (100 TB design intent, verified on local[32]):
  *  - every scan projects only needed columns → parquet column pruning;
  *  - filters are plain Column predicates → pushed to the scan;
  *  - dimension joins (part, customer, nation, region, supplier) are
  *    broadcast explicitly — at 100 TB the fact side never shuffles for
  *    these, only for fact-fact joins on their keys;
  *  - aggregations are partial+final (Catalyst default) — no driver-side
  *    loops anywhere;
  *  - doubles that cross an aggregation are rounded in BOTH engines so
  *    the hash compare is stable against summation-order differences.
  */
object CoreQueries {

  /** A1/A7-style pricing summary (TPC-H Q1 shape; reference analog:
    * extractor_polymarket.py:231-263 status aggregation). */
  val q01PricingSummary = GQuery(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_extendedprice"), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  round(sum(l_quantity), 2) AS sum_qty,
           |  round(sum(l_extendedprice), 2) AS sum_base_price,
           |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
           |  round(avg(l_quantity), 4) AS avg_qty,
           |  round(avg(l_extendedprice), 4) AS avg_price,
           |  count(*) AS count_order
           |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin),
    benchmark = true)

  /** P1/P2 projection + pushed filter (transformer_data.py:568-588). */
  val q02FilterProject = GQuery(
    "q02_filter_project",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" < lit("1996-01-01").cast("timestamp") &&
          $"l_discount" > 0.05 && $"l_quantity".isNotNull)
        // no round() here: the raw IEEE product is bit-identical across
        // engines, while round() diverges on decimal half-boundaries
        // (Spark rounds the shortest decimal repr, DuckDB the binary value)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity,
           |  l_extendedprice * (1.0 - l_discount) AS net_price
           |FROM lineitem
           |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
           |  AND l_quantity IS NOT NULL""".stripMargin))

  /** A1/A8/A12 conditional aggregation (CASE-WHEN counters;
    * validator_warehouse.py:173-214). */
  val q03ConditionalAgg = GQuery(
    "q03_conditional_agg",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d).agg(
        count(lit(1)).as("total_orders"),
        count(when($"o_orderstatus" === "O", 1)).as("open_orders"),
        count(when($"o_orderstatus" === "F", 1)).as("finished_orders"),
        count(when($"o_orderstatus" === "P", 1)).as("pending_orders"),
        countDistinct($"o_orderpriority").as("n_priorities"),
        round(lit(100.0) * count(when($"o_orderstatus" === "O", 1)) / count(lit(1)), 2)
          .as("pct_open"))
    },
    Some("""SELECT count(*) AS total_orders,
           |  count(*) FILTER (WHERE o_orderstatus = 'O') AS open_orders,
           |  count(*) FILTER (WHERE o_orderstatus = 'F') AS finished_orders,
           |  count(*) FILTER (WHERE o_orderstatus = 'P') AS pending_orders,
           |  count(DISTINCT o_orderpriority) AS n_priorities,
           |  round(100.0 * (count(*) FILTER (WHERE o_orderstatus = 'O')) / count(*), 2) AS pct_open
           |FROM orders""".stripMargin))

  /** A2 group-count relation (markets-per-event analog:
    * extractor_polymarket.py:246-272). */
  val q04GroupCount = GQuery(
    "q04_group_count",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d).groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    },
    Some("SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey"))

  /** A3 second-level stats over group counts
    * (extractor_polymarket.py:302-312). */
  val q05GroupStats = GQuery(
    "q05_group_stats",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d).groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
        .agg(
          count(lit(1)).as("n_groups"),
          round(avg($"n_orders"), 4).as("avg_orders"),
          max($"n_orders").as("max_orders"),
          min($"n_orders").as("min_orders"))
    },
    Some("""SELECT count(*) AS n_groups, round(avg(n_orders), 4) AS avg_orders,
           |  max(n_orders) AS max_orders, min(n_orders) AS min_orders
           |FROM (SELECT count(*) AS n_orders FROM orders GROUP BY o_custkey)""".stripMargin))

  /** A4/T2 top-10 groups (extractor_polymarket.py:313-352); plans as
    * TakeOrderedAndProject — no global sort materialization. */
  val q06TopkGroups = GQuery(
    "q06_topk_groups",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d).groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
        .orderBy($"n_orders".desc, $"o_custkey".asc)
        .limit(10)
    },
    Some("""SELECT o_custkey, count(*) AS n_orders FROM orders
           |GROUP BY o_custkey ORDER BY n_orders DESC, o_custkey LIMIT 10""".stripMargin))

  /** A5 percentage-of-total (extractor_polymarket.py:287-299). The
    * grand total joins back as a broadcast single-row aggregate — no
    * global window, so nothing ever funnels through one partition (and
    * the WindowExec single-partition WARN stays out of scale logs). */
  val q07PctOfTotal = GQuery(
    "q07_pct_of_total",
    (s, d) => {
      import s.implicits._
      val counts = Tables.orders(s, d)
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      counts
        .crossJoin(broadcast(counts.agg(sum($"n").as("__tot"))))
        .withColumn("pct", round(lit(100.0) * $"n" / $"__tot", 2))
        .drop("__tot")
    },
    Some("""SELECT o_orderstatus, count(*) AS n,
           |  round(100.0 * count(*) / sum(count(*)) OVER (), 2) AS pct
           |FROM orders GROUP BY o_orderstatus""".stripMargin))

  /** A6 value_counts (transformer_data.py:604-605). */
  val q08ValueCounts = GQuery(
    "q08_value_counts",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d).groupBy($"event_type").agg(count(lit(1)).as("n"))
    },
    Some("SELECT event_type, count(*) AS n FROM events GROUP BY event_type"))

  /** U1/A9 union + distinct of key sets (loader_NeonDB.py:787-829). */
  val q09DistinctUnion = GQuery(
    "q09_distinct_union",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d).select($"l_suppkey".as("key"))
        .union(Tables.supplier(s, d).select($"s_suppkey".as("key")))
        .distinct()
    },
    Some("SELECT l_suppkey AS key FROM lineitem UNION SELECT s_suppkey AS key FROM supplier"))

  /** A10 countDistinct (transformer_data.py:591). */
  val q10Nunique = GQuery(
    "q10_nunique",
    (s, d) => {
      import s.implicits._
      Tables.part(s, d).agg(
        countDistinct($"p_brand").as("n_brands"),
        countDistinct($"p_type").as("n_types"),
        countDistinct($"p_size").as("n_sizes"))
    },
    Some("""SELECT count(DISTINCT p_brand) AS n_brands,
           |  count(DISTINCT p_type) AS n_types,
           |  count(DISTINCT p_size) AS n_sizes FROM part""".stripMargin))

  /** A11 uniqueness audit: COUNT vs COUNT(DISTINCT pk) per table
    * (validator_warehouse.py:79-105). */
  val q11UniquenessAudit = GQuery(
    "q11_uniqueness_audit",
    (s, d) => {
      import s.implicits._
      def audit(name: String, df: DataFrame, pk: String): DataFrame =
        df.agg(count(lit(1)).as("total"), countDistinct(col(pk)).as("distinct_keys"))
          .select(lit(name).as("tbl"), $"total", $"distinct_keys")
      audit("orders", Tables.orders(s, d), "o_orderkey")
        .union(audit("customer", Tables.customer(s, d), "c_custkey"))
        .union(audit("part", Tables.part(s, d), "p_partkey"))
        .union(audit("supplier", Tables.supplier(s, d), "s_suppkey"))
        .union(audit("events", Tables.events(s, d), "event_id"))
        .union(audit("documents", Tables.documents(s, d), "doc_id"))
    },
    Some("""SELECT 'orders' AS tbl, count(*) AS total, count(DISTINCT o_orderkey) AS distinct_keys FROM orders
           |UNION ALL SELECT 'customer', count(*), count(DISTINCT c_custkey) FROM customer
           |UNION ALL SELECT 'part', count(*), count(DISTINCT p_partkey) FROM part
           |UNION ALL SELECT 'supplier', count(*), count(DISTINCT s_suppkey) FROM supplier
           |UNION ALL SELECT 'events', count(*), count(DISTINCT event_id) FROM events
           |UNION ALL SELECT 'documents', count(*), count(DISTINCT doc_id) FROM documents""".stripMargin))

  /** A13 null-safe totals via COALESCE (validator_warehouse.py:234-243). */
  val q12NullSafeTotal = GQuery(
    "q12_null_safe_total",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d).agg(
        coalesce(sum(when($"event_type" === "no_such_type", $"value")), lit(0.0))
          .as("missing_total"),
        round(coalesce(sum(when($"event_type" === "purchase", $"value")), lit(0.0)), 2)
          .as("purchase_total"))
    },
    Some("""SELECT coalesce(sum(CASE WHEN event_type = 'no_such_type' THEN value END), 0.0) AS missing_total,
           |  round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0.0), 2) AS purchase_total
           |FROM events""".stripMargin))

  /** A14 table row counts (loader_NeonDB.py:657-677). */
  val q13RowCounts = GQuery(
    "q13_row_counts",
    (s, d) => {
      import s.implicits._
      Tables.all.map { t =>
        Tables.read(s, d, t).agg(count(lit(1)).as("n_rows")).select(lit(t).as("tbl"), $"n_rows")
      }.reduce(_ union _)
    },
    Some(Tables.all.map { t =>
      s"SELECT '$t' AS tbl, count(*) AS n_rows FROM $t"
    }.mkString("\nUNION ALL ")))

  /** P7/J1 broadcast left-semi join (loader_NeonDB.py:745-747). */
  val q14SemiJoin = GQuery(
    "q14_semi_join",
    (s, d) => {
      import s.implicits._
      val building = Tables.customer(s, d)
        .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
      Tables.orders(s, d)
        .join(broadcast(building), $"o_custkey" === $"c_custkey", "left_semi")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n_orders"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders FROM orders
           |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
           |GROUP BY o_orderpriority""".stripMargin))

  /** J3 anti-join orphan detection (validator_warehouse.py:110-154).
    * Single-row count so the result is non-empty even when no orphans
    * exist (the healthy case). */
  val q15AntiJoin = GQuery(
    "q15_anti_join",
    (s, d) => {
      import s.implicits._
      Tables.customer(s, d)
        .join(Tables.orders(s, d).select($"o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_customers_no_orders"),
          countDistinct($"c_mktsegment").as("n_segments_affected"))
    },
    Some("""SELECT count(*) AS n_customers_no_orders,
           |  count(DISTINCT c_mktsegment) AS n_segments_affected
           |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin))

  /** J2 broadcast dimension lookup join (loader_NeonDB.py:261-264 dict
    * lookup → broadcast hash join; fact side never shuffles). */
  val q16BroadcastLookup = GQuery(
    "q16_broadcast_lookup",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand")),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT p_brand, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           |  count(*) AS n_items
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |GROUP BY p_brand""".stripMargin),
    benchmark = true)

  /** Multi-way star join: fact × 4 broadcast dims (TPC-H Q5 shape).
    * At 100 TB: lineitem/orders shuffle on orderkey once; customer,
    * nation, region broadcast. */
  val q17RegionalRevenue = GQuery(
    "q17_regional_revenue",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_extendedprice", $"l_discount")
      val o  = Tables.orders(s, d).select($"o_orderkey", $"o_custkey")
      val c  = Tables.customer(s, d).select($"c_custkey", $"c_nationkey")
      val n  = Tables.nation(s, d).select($"n_nationkey", $"n_name", $"n_regionkey")
      val r  = Tables.region(s, d).select($"r_regionkey", $"r_name")
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("""SELECT r_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
           |  count(*) AS n_items
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name""".stripMargin),
    benchmark = true)

  /** J5/F12 date-dimension derivation with deterministic surrogate keys
    * (loader_NeonDB.py:266-285; dayofweek shifted to pandas Monday=0
    * convention per SURVEY §2.8 F12 note). */
  val q18DateDim = GQuery(
    "q18_date_dim",
    (s, d) => {
      import s.implicits._
      import graft.functions.Normalize
      import graft.operators.StarSchema
      val dates = Tables.orders(s, d)
        .select($"o_orderdate".cast("date").as("fecha_d")).distinct()
      StarSchema.seqKey(dates, "fecha_d", "fecha_id")
        .withColumn("anio", year($"fecha_d"))
        .withColumn("mes", month($"fecha_d"))
        .withColumn("dia", dayofmonth($"fecha_d"))
        .withColumn("trimestre", quarter($"fecha_d"))
        .withColumn("dia_semana", Normalize.dayOfWeekMonday0($"fecha_d"))
        .withColumn("es_fin_semana", Normalize.isWeekend($"fecha_d"))
        // ISO string on the wire: date physical types differ across
        // engines/pandas; the string form is unambiguous
        .withColumn("fecha", date_format($"fecha_d", "yyyy-MM-dd"))
        .drop("fecha_d")
    },
    Some("""SELECT CAST(fecha AS VARCHAR) AS fecha,
           |  CAST(year(fecha) AS INT) AS anio, CAST(month(fecha) AS INT) AS mes,
           |  CAST(day(fecha) AS INT) AS dia,
           |  CAST(quarter(fecha) AS INT) AS trimestre,
           |  CAST(isodow(fecha) - 1 AS INT) AS dia_semana,
           |  isodow(fecha) - 1 IN (5, 6) AS es_fin_semana,
           |  CAST(row_number() OVER (ORDER BY fecha) AS INT) AS fecha_id
           |FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS fecha FROM orders)""".stripMargin))

  /** W1 latest-per-key window dedup (spark_cleaner.py:109-114). */
  val q19LatestPerKey = GQuery(
    "q19_latest_per_key",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type", $"value")
    },
    Some("""SELECT user_id, event_id, event_type, value
           |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           |      FROM events)
           |WHERE rn = 1""".stripMargin),
    benchmark = true)

  /** W3 first-seen dedup, made deterministic as min-id-per-key
    * (transformer_data.py:222-225). */
  val q20FirstSeen = GQuery(
    "q20_first_seen",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id", $"event_type")
        .agg(min($"event_id").as("first_event_id"), count(lit(1)).as("n_events"))
    },
    Some("""SELECT user_id, event_type, min(event_id) AS first_event_id,
           |  count(*) AS n_events
           |FROM events GROUP BY user_id, event_type""".stripMargin))

  /** W2 latest-per-content dedup (transformer_data.py:500-518). */
  val q21ContentDedup = GQuery(
    "q21_content_dedup",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id".desc)
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"lang", $"source", $"doc_id", $"n_chars")
    },
    Some("""SELECT lang, source, doc_id, n_chars
           |FROM (SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY doc_id DESC) AS rn
           |      FROM documents)
           |WHERE rn = 1""".stripMargin))

  /** T1 top-50 by value with projection (extract_gaming_data.py:100-109);
    * plans as TakeOrderedAndProject (per-partition heap + driver merge,
    * no global sort). */
  val q22Top50 = GQuery(
    "q22_top50_by_value",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(50)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
           |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin))

  /** Temporal self-join: hour-over-hour user retention (active users
    * per hour vs those also active the following hour). Plan shape:
    * one shuffle for the distinct on (h, user_id), then a second
    * exchange of the hour-shifted side onto the join key; at 100 TB,
    * partitioning the events store by time would let each side prune
    * to adjacent slices. */
  val q58Retention = GQuery(
    "q58_retention",
    (s, d) => {
      import s.implicits._
      val perHour = Tables.events(s, d)
        .select(date_trunc("hour", $"ts").as("h"), $"user_id").distinct()
      val next = perHour.select(($"h" - expr("INTERVAL 1 HOUR")).as("h"),
        $"user_id", lit(1).as("came_back"))
      perHour.join(next, Seq("h", "user_id"), "left")
        .groupBy($"h")
        .agg(count(lit(1)).as("active_users"),
          count($"came_back").as("retained_users"))
        .select(date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
          $"active_users", $"retained_users")
    },
    Some("""WITH per_hour AS (
           |  SELECT DISTINCT date_trunc('hour', ts) AS h, user_id FROM events)
           |SELECT strftime(a.h, '%Y-%m-%d %H:%M:%S') AS hour,
           |  count(*) AS active_users,
           |  count(b.user_id) AS retained_users
           |FROM per_hour a
           |LEFT JOIN per_hour b ON b.user_id = a.user_id AND b.h = a.h + INTERVAL 1 HOUR
           |GROUP BY a.h""".stripMargin))

  /** ROLLUP hierarchy totals (beyond the reference's flat GROUP BYs —
    * the multi-grain report its per-level queries approximate).
    * grouping() flags disambiguate real NULLs from subtotal rows. */
  val q59Rollup = GQuery(
    "q59_rollup",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("anio", year($"o_orderdate"))
        .rollup($"anio", $"o_orderstatus")
        .agg(round(sum($"o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"),
          grouping($"anio").as("g_anio"), grouping($"o_orderstatus").as("g_status"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS anio, o_orderstatus,
           |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders,
           |  CAST(grouping(anio) AS TINYINT) AS g_anio,
           |  CAST(grouping(o_orderstatus) AS TINYINT) AS g_status
           |FROM orders GROUP BY ROLLUP (anio, o_orderstatus)""".stripMargin))

  /** Sketch-based approximations (the 100 TB variants of A10/median):
    * HLL distinct counts and quantile sketches have no cross-engine
    * bit-identical twin — so the TOLERANCE CHECK runs inside the query
    * as boolean columns both engines can hash-match (the oracle knows
    * the checks must hold; Spark proves its sketches actually do).
    * approx_count_distinct at rsd=0.01 must land within 5% of the
    * exact count; percentile_approx at accuracy=10000 must land within
    * 1% of the exact interpolated median. The exact count rides along
    * so the row still pins real values, not just booleans. */
  val q60ApproxSketches = GQuery(
    "q60_approx_sketches",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d).agg(
        approx_count_distinct($"o_custkey", 0.01).as("approx_cd"),
        countDistinct($"o_custkey").as("exact_customers"),
        percentile_approx($"o_totalprice", lit(0.5), lit(10000)).as("approx_med"),
        expr("percentile(o_totalprice, 0.5)").as("exact_med"))
        .select($"exact_customers",
          (abs($"approx_cd" - $"exact_customers") <=
            $"exact_customers" * 0.05).as("approx_distinct_ok"),
          (abs($"approx_med" - $"exact_med") <= $"exact_med" * 0.01)
            .as("approx_median_ok"))
    },
    Some("""SELECT count(DISTINCT o_custkey) AS exact_customers,
           |  true AS approx_distinct_ok, true AS approx_median_ok
           |FROM orders""".stripMargin))

  /** Exact interpolated percentiles (median/p95) — both engines use
    * linear interpolation (Spark `percentile` ≡ DuckDB
    * `quantile_cont`), verified to hash-match exactly. */
  val q61Percentiles = GQuery(
    "q61_percentiles",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("median"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"))
    },
    Some("""SELECT o_orderstatus,
           |  round(quantile_cont(o_totalprice, 0.5), 4) AS median,
           |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95
           |FROM orders GROUP BY o_orderstatus""".stripMargin))

  /** The SQL entry point: the same engine drives spark.sql over
    * registered views (users can keep their SQL; Catalyst plans both
    * surfaces identically). */
  val q62SqlSurface = GQuery(
    "q62_sql_surface",
    (s, d) => {
      // view names scoped to the data dir: a shared session running
      // this query against two sfDirs must not cross-wire the views
      val tag = java.lang.Integer.toHexString(d.hashCode)
      Tables.orders(s, d).createOrReplaceTempView(s"orders_v_$tag")
      Tables.customer(s, d).createOrReplaceTempView(s"customer_v_$tag")
      // broadcast hint keeps the documented plan shape (dim broadcast,
      // fact never shuffles) independent of autoBroadcastJoinThreshold
      s.sql(s"""SELECT /*+ BROADCAST(customer_v_$tag) */ c_mktsegment,
               |  count(*) AS n_orders,
               |  round(sum(o_totalprice), 2) AS revenue
               |FROM orders_v_$tag JOIN customer_v_$tag ON o_custkey = c_custkey
               |GROUP BY c_mktsegment""".stripMargin)
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
           |  round(sum(o_totalprice), 2) AS revenue
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_mktsegment""".stripMargin))

  /** Frame-spec windows beyond row_number (engine completeness; the
    * reference never needed them): per-user running total and
    * previous-event delta. Sequential accumulation over a total order
    * (ts, event_id) is deterministic in both engines. */
  val q63WindowFrames = GQuery(
    "q63_window_frames",
    (s, d) => {
      import s.implicits._
      // asc_nulls_last: DuckDB's ASC default is NULLS LAST while
      // Spark's is NULLS FIRST — align explicitly
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".asc_nulls_last, $"event_id".asc)
      Tables.events(s, d)
        .withColumn("running_value",
          round(sum($"value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .withColumn("prev_value", lag($"value", 1).over(w))
        .withColumn("rank_in_user", row_number().over(w))
        .filter($"rank_in_user" <= 5)
        .select($"user_id", $"event_id", $"rank_in_user", $"running_value", $"prev_value")
    },
    Some("""SELECT user_id, event_id, rank_in_user, running_value, prev_value FROM (
           |  SELECT user_id, event_id,
           |    row_number() OVER w AS rank_in_user,
           |    round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
           |    lag(value, 1) OVER w AS prev_value
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           |WHERE rank_in_user <= 5""".stripMargin))

  /** PIVOT: status columns out of status rows (explicit value list so
    * the plan needs no extra distinct-scan pass; Catalyst compiles it
    * to one pass of conditional aggregates — exactly the oracle's
    * FILTER form, which is also why the two engines cannot diverge). */
  val q88Pivot = GQuery(
    "q88_pivot",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("anio", year($"o_orderdate"))
        .groupBy($"anio")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(round(sum($"o_totalprice"), 2))
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS anio,
           |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS "O",
           |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS "F",
           |  round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS "P"
           |FROM orders GROUP BY anio""".stripMargin))

  /** CUBE: all four grouping-set grains in one pass (q59's ROLLUP
    * sibling — completes the grouping-sets surface). */
  val q89Cube = GQuery(
    "q89_cube",
    (s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .withColumn("anio", year($"o_orderdate"))
        .cube($"anio", $"o_orderstatus")
        .agg(round(sum($"o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"),
          grouping($"anio").as("g_anio"), grouping($"o_orderstatus").as("g_status"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS anio, o_orderstatus,
           |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders,
           |  CAST(grouping(anio) AS TINYINT) AS g_anio,
           |  CAST(grouping(o_orderstatus) AS TINYINT) AS g_status
           |FROM orders GROUP BY CUBE (anio, o_orderstatus)""".stripMargin))

  /** Ranking-window family (ntile/percent_rank/cume_dist/dense_rank) —
    * the order is made TOTAL with the unique orderkey tiebreak, since
    * ntile assigns by row position and a tie would be engine-arbitrary. */
  val q90RankingWindows = GQuery(
    "q90_ranking_windows",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice".asc, $"o_orderkey".asc)
      Tables.orders(s, d)
        .filter($"o_orderkey" % 100 === 0)
        .select($"o_orderstatus", $"o_orderkey",
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          dense_rank().over(w).as("drank"))
    },
    Some("""SELECT o_orderstatus, o_orderkey,
           |  ntile(4) OVER w AS quartile,
           |  round(percent_rank() OVER w, 6) AS pct_rank,
           |  round(cume_dist() OVER w, 6) AS cume,
           |  CAST(dense_rank() OVER w AS BIGINT) AS drank
           |FROM orders WHERE o_orderkey % 100 = 0
           |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""".stripMargin))

  /** UNPIVOT (melt): q88's inverse — wide per-year status columns back
    * to (anio, status, revenue) rows. `unpivot` drops null cells by
    * contract (Spark and DuckDB agree), so years lacking a status
    * simply emit no row on either side. */
  val q91Unpivot = GQuery(
    "q91_unpivot",
    (s, d) => {
      import s.implicits._
      val wide = Tables.orders(s, d)
        .withColumn("anio", year($"o_orderdate"))
        .groupBy($"anio")
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(round(sum($"o_totalprice"), 2))
      wide.unpivot(Array($"anio"), Array($"O", $"F", $"P"), "status", "revenue")
    },
    Some("""WITH wide AS (
           |  SELECT CAST(year(o_orderdate) AS INT) AS anio,
           |    round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS "O",
           |    round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 2) AS "F",
           |    round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 2) AS "P"
           |  FROM orders GROUP BY anio)
           |UNPIVOT wide ON "O", "F", "P" INTO NAME status VALUE revenue""".stripMargin))

  val all: Seq[GQuery] = Seq(
    q01PricingSummary, q02FilterProject, q03ConditionalAgg, q04GroupCount,
    q05GroupStats, q06TopkGroups, q07PctOfTotal, q08ValueCounts,
    q09DistinctUnion, q10Nunique, q11UniquenessAudit, q12NullSafeTotal,
    q13RowCounts, q14SemiJoin, q15AntiJoin, q16BroadcastLookup,
    q17RegionalRevenue, q18DateDim, q19LatestPerKey, q20FirstSeen,
    q21ContentDedup, q22Top50, q58Retention, q59Rollup, q60ApproxSketches,
    q61Percentiles, q62SqlSurface, q63WindowFrames, q88Pivot, q89Cube,
    q90RankingWindows, q91Unpivot)
}
