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
        // flag on the ROUNDED z: set membership must depend on the 4dp
        // value both engines ship, not on last-ULP engine-order noise
        // sitting exactly at the threshold
        .withColumn("z", round(($"v" - $"mu") / $"sd", 4))
        .where(abs($"z") > 2.0)
        .select($"event_type", date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
          $"z")
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
           |WHERE sd IS NOT NULL AND sd > 0 AND abs(round((v - mu) / sd, 4)) > 2.0
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

  /** PageRank (3 iterations, d=0.85) over the part co-purchase graph
    * (parts sharing an order, both directions — symmetric, so no
    * dangling-mass leak). The oracle unrolls the same three rounds as
    * CTEs; constants are written op-for-op ((1.0 − 0.85)/n, never a
    * folded 0.15) so both engines produce the same IEEE bits before
    * the final rounding. Ranks ship ×1000 at 6 dp. */
  val q108Pagerank = GQuery(
    "q108_pagerank",
    (s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey")
      val edges = li
        .join(li.withColumnRenamed("l_partkey", "p2"), "l_orderkey")
        .where($"l_partkey" =!= $"p2")
        .select($"l_partkey".as("src"), $"p2".as("dst"))
      graft.operators.Graph.pagerank(edges, iters = 3)
        .select($"node".as("part"), round($"rank" * 1000.0, 6).as("rank_pm"))
        .orderBy($"rank_pm".desc, $"part")
        .limit(20)
    },
    Some("""WITH pairs AS (
           |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
           |  FROM lineitem a JOIN lineitem b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
           |nodes AS (SELECT src AS node FROM pairs UNION SELECT dst FROM pairs),
           |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
           |deg AS (SELECT src, count(*) AS deg FROM pairs GROUP BY src),
           |r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn),
           |c1 AS (SELECT dst AS node, sum(rank / deg) AS mass
           |       FROM pairs JOIN deg USING (src) JOIN r0 ON r0.node = pairs.src GROUP BY dst),
           |r1 AS (SELECT nodes.node, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(mass, 0.0) AS rank
           |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.node = nodes.node),
           |c2 AS (SELECT dst AS node, sum(rank / deg) AS mass
           |       FROM pairs JOIN deg USING (src) JOIN r1 ON r1.node = pairs.src GROUP BY dst),
           |r2 AS (SELECT nodes.node, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(mass, 0.0) AS rank
           |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.node = nodes.node),
           |c3 AS (SELECT dst AS node, sum(rank / deg) AS mass
           |       FROM pairs JOIN deg USING (src) JOIN r2 ON r2.node = pairs.src GROUP BY dst),
           |r3 AS (SELECT nodes.node, (1.0 - 0.85) / nn.n + 0.85 * COALESCE(mass, 0.0) AS rank
           |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.node = nodes.node)
           |SELECT node AS part, round(rank * 1000.0, 6) AS rank_pm
           |FROM r3 ORDER BY rank_pm DESC, part LIMIT 20""".stripMargin),
    benchmark = true)

  /** Ordered conversion funnel view → click → purchase: each stage's
    * timestamp must strictly follow the previous stage's FIRST
    * occurrence. Timestamp comparisons are exact (µs), so the stage
    * sets — not just the counts — agree across engines. */
  val q109Funnel = GQuery(
    "q109_funnel",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      // each stage frame is materialized once (localCheckpoint, not
      // cache: blocks are released by the ContextCleaner when the
      // result is dropped, instead of pinning session memory): v feeds
      // c, p AND the final counts — without materialization the events
      // scan + view aggregation would re-run for every downstream
      // branch (6 scans instead of 3)
      val v = ev.where($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1")).localCheckpoint(true)
      val c = ev.where($"event_type" === "click").join(v, "user_id")
        .where($"ts" > $"t1")
        .groupBy($"user_id").agg(min($"ts").as("t2")).localCheckpoint(true)
      val p = ev.where($"event_type" === "purchase").join(c, "user_id")
        .where($"ts" > $"t2")
        .groupBy($"user_id").agg(min($"ts").as("t3"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .agg(count($"t1").as("n_view"), count($"t2").as("n_click_after"),
          count($"t3").as("n_purchase_after"))
    },
    Some("""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           |           WHERE event_type = 'view' GROUP BY user_id),
           |c AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
           |      WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
           |p AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
           |      WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
           |SELECT (SELECT count(*) FROM v) AS n_view,
           |       (SELECT count(*) FROM c) AS n_click_after,
           |       (SELECT count(*) FROM p) AS n_purchase_after""".stripMargin))

  /** Winsorized robust stats: clamp value to its per-group [p01, p99]
    * (exact interpolated percentiles, proven bit-compatible in q103)
    * and compare the raw vs clamped mean — the outlier-robust QA
    * summary. */
  val q110WinsorizedStats = GQuery(
    "q110_winsorized_stats",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val bounds = ev.groupBy($"event_type")
        .agg(expr("percentile(value, 0.01D)").as("lo"),
          expr("percentile(value, 0.99D)").as("hi"))
      // bounds are 6dp-quantized before ANY comparison: the two
      // engines' interpolation formulas can differ by an ULP when the
      // percentile position is fractional over duplicate values, and an
      // unrounded `value > hi` at exactly that boundary would flip
      // n_clamped in one engine only.
      ev.join(broadcast(bounds), "event_type")
        .withColumn("lo_q", round($"lo", 6))
        .withColumn("hi_q", round($"hi", 6))
        .withColumn("clamped", least(greatest($"value", $"lo_q"), $"hi_q"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          round(avg($"value"), 4).as("raw_mean"),
          round(avg($"clamped"), 4).as("wins_mean"),
          count(when($"value" < $"lo_q" || $"value" > $"hi_q", 1)).as("n_clamped"))
        .orderBy($"event_type")
    },
    Some("""WITH bounds AS (
           |  SELECT event_type, round(quantile_cont(value, 0.01), 6) AS lo,
           |         round(quantile_cont(value, 0.99), 6) AS hi
           |  FROM events GROUP BY event_type)
           |SELECT event_type, count(*) AS n,
           |       round(avg(value), 4) AS raw_mean,
           |       round(avg(least(greatest(value, lo), hi)), 4) AS wins_mean,
           |       count(*) FILTER (WHERE value < lo OR value > hi) AS n_clamped
           |FROM events JOIN bounds USING (event_type)
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Markov transition matrix over per-user event sequences:
    * P(next | current) from lead() pairs, user-partitioned windows
    * only. The probabilities are int÷int quotients — bit-identical
    * cross-engine before the display rounding. */
  val q115MarkovTransitions = GQuery(
    "q115_markov_transitions",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val pairs = Tables.events(s, d)
        .withColumn("nxt", lead($"event_type", 1).over(w))
        .where($"nxt".isNotNull)
        .groupBy($"event_type".as("cur"), $"nxt")
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy($"cur").agg(sum($"n").as("n_cur"))
      pairs.join(broadcast(totals), "cur")
        .select($"cur", $"nxt", $"n",
          round($"n".cast("double") / $"n_cur".cast("double"), 6).as("p"))
        .orderBy($"cur", $"nxt")
    },
    Some("""WITH pairs AS (
           |  SELECT event_type AS cur,
           |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           |  FROM events),
           |counts AS (
           |  SELECT cur, nxt, count(*) AS n FROM pairs WHERE nxt IS NOT NULL GROUP BY cur, nxt),
           |totals AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur FROM counts GROUP BY cur)
           |SELECT cur, nxt, n,
           |       round(CAST(n AS DOUBLE) / CAST(n_cur AS DOUBLE), 6) AS p
           |FROM counts JOIN totals USING (cur)
           |ORDER BY cur, nxt""".stripMargin))

  /** Distribution-drift detection (PSI): value histograms of the first
    * vs second half of the month per event type, Laplace-smoothed
    * shares, PSI = Σ (pa−pb)·ln(pa/pb). Bin edges are the q107-style
    * shared IEEE expression (bit-deterministic membership); smoothing
    * guarantees no zero shares, so the ln is always defined. */
  val q116DriftPsi = GQuery(
    "q116_drift_psi",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val stats = ev.agg(min($"value").as("lo"), max($"value").as("hi"))
      val binned = ev.crossJoin(broadcast(stats))
        .withColumn("bin",
          least(floor(($"value" - $"lo") / (($"hi" - $"lo") / 10.0)), lit(9.0)).cast("int"))
        .withColumn("half",
          when($"ts" < lit("2024-01-16").cast("timestamp"), "a").otherwise("b"))
      val cells = binned.groupBy($"event_type", $"bin", $"half")
        .agg(count(lit(1)).as("n"))
      val wide = cells.groupBy($"event_type", $"bin")
        .agg(sum(when($"half" === "a", $"n").otherwise(0L)).as("na"),
          sum(when($"half" === "b", $"n").otherwise(0L)).as("nb"))
      val tot = wide.groupBy($"event_type")
        .agg(sum($"na").as("ta"), sum($"nb").as("tb"))
      wide.join(broadcast(tot), "event_type")
        .withColumn("pa", ($"na".cast("double") + 1.0) / ($"ta".cast("double") + 10.0))
        .withColumn("pb", ($"nb".cast("double") + 1.0) / ($"tb".cast("double") + 10.0))
        .groupBy($"event_type")
        .agg(round(sum(($"pa" - $"pb") * log($"pa" / $"pb")), 6).as("psi"),
          count(lit(1)).as("n_bins"))
        .orderBy($"event_type")
    },
    Some("""WITH stats AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
           |binned AS (
           |  SELECT event_type,
           |         CAST(least(floor((value - lo) / ((hi - lo) / 10.0)), 9.0) AS INT) AS bin,
           |         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END AS half
           |  FROM events CROSS JOIN stats),
           |wide AS (
           |  SELECT event_type, bin,
           |         count(*) FILTER (WHERE half = 'a') AS na,
           |         count(*) FILTER (WHERE half = 'b') AS nb
           |  FROM binned GROUP BY event_type, bin),
           |tot AS (
           |  SELECT event_type, CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
           |  FROM wide GROUP BY event_type)
           |SELECT event_type,
           |       round(sum(((na + 1.0) / (ta + 10.0) - (nb + 1.0) / (tb + 10.0)) *
           |                 ln(((na + 1.0) / (ta + 10.0)) / ((nb + 1.0) / (tb + 10.0)))), 6) AS psi,
           |       count(*) AS n_bins
           |FROM wide JOIN tot USING (event_type)
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** q137 — lag-1 autocorrelation of each event type's value series:
    * Pearson correlation of (value, next value) pairs in time order.
    * lead() is event_type-partitioned; corr rounds to 6 dp (the q104
    * recipe — both engines' corr is numerically stable enough at this
    * scale for 6 digits).
    */
  val q137AutocorrLag1 = GQuery(
    "q137_autocorr_lag1",
    (s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
      Tables.events(s, d)
        .withColumn("nxt", lead($"value", 1).over(w))
        .where($"nxt".isNotNull)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_pairs"),
          round(corr($"value", $"nxt"), 6).as("acf1"))
        .orderBy($"event_type")
    },
    Some("""WITH p AS (
           |  SELECT event_type, value,
           |         lead(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
           |  FROM events)
           |SELECT event_type, count(*) AS n_pairs, round(corr(value, nxt), 6) AS acf1
           |FROM p WHERE nxt IS NOT NULL
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** q141 — triangle counting + global clustering coefficient over a
    * user co-occurrence graph (users sharing ≥2 (event_type, hour)
    * buckets form an edge). Edges are id-oriented (ua < ub), so each
    * triangle materializes exactly once as the two-path a→b→c closed by
    * the a→c edge — three equi-joins on node keys, the standard
    * distributed formulation (at 100 TB you'd orient by degree instead
    * of id to bound the skew of hub two-paths; same plan shape).
    * Triplet counts are pure integer math (`div` ≡ `//`).
    */
  val q141TriangleCount = GQuery(
    "q141_triangle_count",
    (s, d) => {
      import s.implicits._
      val occ = Tables.events(s, d)
        .select($"event_type", date_trunc("hour", $"ts").as("h"), $"user_id")
        .distinct()
      val edges = occ.select($"event_type", $"h", $"user_id".as("ua"))
        .join(occ.select($"event_type", $"h", $"user_id".as("ub")),
          Seq("event_type", "h"))
        .where($"ua" < $"ub")
        .groupBy($"ua", $"ub").agg(count(lit(1)).as("w"))
        .where($"w" >= 2)
        .select($"ua", $"ub")
      graft.operators.Graph.triangleStats(edges)
    },
    Some("""WITH occ AS (
           |  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id FROM events),
           |edges AS (
           |  SELECT ua, ub FROM (
           |    SELECT a.user_id AS ua, b.user_id AS ub, count(*) AS w
           |    FROM occ a JOIN occ b
           |      ON a.event_type = b.event_type AND a.h = b.h AND a.user_id < b.user_id
           |    GROUP BY ua, ub)
           |  WHERE w >= 2),
           |tri AS (SELECT count(*) AS n_triangles
           |        FROM edges e1
           |        JOIN edges e2 ON e2.ua = e1.ub
           |        JOIN edges e3 ON e3.ua = e1.ua AND e3.ub = e2.ub),
           |deg AS (SELECT u, count(*) AS deg FROM (
           |          SELECT ua AS u FROM edges UNION ALL SELECT ub FROM edges)
           |        GROUP BY u),
           |dd AS (SELECT count(*) AS n_nodes,
           |              COALESCE(CAST(sum((deg * (deg - 1)) // 2) AS BIGINT), 0) AS n_triplets
           |       FROM deg),
           |ee AS (SELECT count(*) AS n_edges FROM edges)
           |SELECT n_nodes, n_edges, n_triangles, n_triplets,
           |       CASE WHEN n_triplets > 0
           |            THEN round(3.0 * CAST(n_triangles AS DOUBLE) /
           |                       CAST(n_triplets AS DOUBLE), 6)
           |            ELSE 0.0 END AS clustering
           |FROM dd CROSS JOIN ee CROSS JOIN tri""".stripMargin))

  /** q145 — equi-DEPTH histogram (quantile-bounded bins), the
    * complement of q107's equi-width bins: 10 bins per event type whose
    * edges are the deciles, so bin populations are near-equal. Edges
    * are 6dp-quantized before any membership comparison (q128 recipe —
    * cross-engine percentile interpolation differs at the ULP); bin
    * assignment is then 9 comparisons against broadcast bounds, never
    * a global ntile sort.
    */
  val q145EquiDepthHistogram = GQuery(
    "q145_equidepth_histogram",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val boundCols = (1 to 9).map(i =>
        round(expr(s"percentile(value, ${i / 10.0}D)"), 6).as(s"b$i"))
      val bounds = ev.groupBy($"event_type").agg(boundCols.head, boundCols.tail: _*)
      val bin = (1 to 9).map(i => ($"value" > col(s"b$i")).cast("int")).reduce(_ + _)
      ev.join(broadcast(bounds), "event_type")
        .withColumn("bin", bin)
        .groupBy($"event_type", $"bin")
        .agg(count(lit(1)).as("n"),
          round(min($"value"), 4).as("lo"), round(max($"value"), 4).as("hi"))
        .orderBy($"event_type", $"bin")
    },
    Some("""WITH b AS (
           |  SELECT event_type,
           |         round(quantile_cont(value, 0.1), 6) AS b1,
           |         round(quantile_cont(value, 0.2), 6) AS b2,
           |         round(quantile_cont(value, 0.3), 6) AS b3,
           |         round(quantile_cont(value, 0.4), 6) AS b4,
           |         round(quantile_cont(value, 0.5), 6) AS b5,
           |         round(quantile_cont(value, 0.6), 6) AS b6,
           |         round(quantile_cont(value, 0.7), 6) AS b7,
           |         round(quantile_cont(value, 0.8), 6) AS b8,
           |         round(quantile_cont(value, 0.9), 6) AS b9
           |  FROM events GROUP BY event_type)
           |SELECT e.event_type,
           |       ((value > b1)::INT + (value > b2)::INT + (value > b3)::INT +
           |        (value > b4)::INT + (value > b5)::INT + (value > b6)::INT +
           |        (value > b7)::INT + (value > b8)::INT + (value > b9)::INT) AS bin,
           |       count(*) AS n,
           |       round(min(value), 4) AS lo, round(max(value), 4) AS hi
           |FROM events e JOIN b ON e.event_type = b.event_type
           |GROUP BY e.event_type, bin ORDER BY e.event_type, bin""".stripMargin))

  /** q146 — correlated-subquery SQL surface: EXISTS / NOT EXISTS with
    * outer references plus a scalar subquery threshold, run from the
    * SAME ANSI text in both engines (Spark de-correlates to semi/anti
    * joins under the hood — `.explain` shows the rewrite). The scalar
    * avg is rounded post-aggregation before the comparison, so the
    * threshold both engines apply is the identical double.
    */
  private def q146Sql(customer: String, orders: String) =
    s"""SELECT c_mktsegment, count(*) AS n_whales
       |FROM $customer c
       |WHERE EXISTS (
       |        SELECT 1 FROM $orders o
       |        WHERE o.o_custkey = c.c_custkey
       |          AND o.o_totalprice > (SELECT round(avg(o_totalprice), 4) FROM $orders))
       |  AND NOT EXISTS (
       |        SELECT 1 FROM $orders o2
       |        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
       |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  val q146ExistsSubquery = GQuery(
    "q146_exists_subquery",
    (s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("q146_customer")
      Tables.orders(s, d).createOrReplaceTempView("q146_orders")
      s.sql(q146Sql("q146_customer", "q146_orders"))
    },
    Some(q146Sql("customer", "orders")))

  /** q153 — set-operation SQL surface: INTERSECT (customers with both
    * open AND finished orders), EXCEPT (open-only), and EXCEPT ALL
    * (multiplicity-preserving — the bag difference DISTINCT-based
    * EXCEPT cannot express). One ANSI text runs in both engines
    * (q146 recipe); Spark plans each as a hash semi/anti join with
    * partial distinct pushed below the exchange.
    */
  private def q153Sql(orders: String) =
    s"""SELECT 'both_statuses' AS op, count(*) AS n FROM (
       |  SELECT o_custkey FROM $orders WHERE o_orderstatus = 'O'
       |  INTERSECT
       |  SELECT o_custkey FROM $orders WHERE o_orderstatus = 'F') t1
       |UNION ALL
       |SELECT 'open_only', count(*) FROM (
       |  SELECT o_custkey FROM $orders WHERE o_orderstatus = 'O'
       |  EXCEPT
       |  SELECT o_custkey FROM $orders WHERE o_orderstatus = 'F') t2
       |UNION ALL
       |SELECT 'open_minus_finished_bag', count(*) FROM (
       |  SELECT o_custkey FROM $orders WHERE o_orderstatus = 'O'
       |  EXCEPT ALL
       |  SELECT o_custkey FROM $orders WHERE o_orderstatus = 'F') t3
       |ORDER BY op""".stripMargin

  val q153SetopsSurface = GQuery(
    "q153_setops_surface",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("q153_orders")
      s.sql(q153Sql("q153_orders"))
    },
    Some(q153Sql("orders")))

  /** q155 — robust outlier detection via Median Absolute Deviation:
    * score = |x − median| / (1.4826·MAD), flag > 3.5 (the classic
    * Iglewicz–Hoaglin rule). Unlike q105's mean/stddev z-score this
    * survives heavy-tailed data (the outliers can't inflate their own
    * threshold). Two tiny per-group median tables broadcast back; both
    * medians are 6dp-quantized pre-comparison (q145 recipe). A
    * zero-MAD group (>50% identical values) scores NULL rather than
    * dividing by zero — ANSI mode would throw.
    */
  val q155MadOutliers = GQuery(
    "q155_mad_outliers",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val med = ev.groupBy($"event_type")
        .agg(round(expr("percentile(value, 0.5D)"), 6).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs($"value" - $"med"))
      val mad = dev.groupBy($"event_type")
        .agg(round(expr("percentile(adev, 0.5D)"), 6).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .withColumn("score",
          when($"mad" > 0, $"adev" / (lit(1.4826) * $"mad")))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          count(when($"score" > 3.5, 1)).as("n_outliers"),
          round(max($"score"), 4).as("max_score"))
        .orderBy($"event_type")
    },
    Some("""WITH med AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
           |            FROM events GROUP BY event_type),
           |dev AS (SELECT e.event_type, value, abs(value - med) AS adev
           |        FROM events e JOIN med USING (event_type)),
           |mad AS (SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
           |        FROM dev GROUP BY event_type),
           |scored AS (
           |  SELECT dev.event_type,
           |         CASE WHEN mad > 0 THEN adev / (1.4826 * mad) END AS score
           |  FROM dev JOIN mad USING (event_type))
           |SELECT event_type, count(*) AS n,
           |       count(*) FILTER (WHERE score > 3.5) AS n_outliers,
           |       round(max(score), 4) AS max_score
           |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** q159 — custom typed Aggregator surface: per-type sample variance
    * through the Welford/Chan `Aggregator` (functions/Aggregates.scala)
    * — the UDAF registration path the engine otherwise avoids, proven
    * against DuckDB's var_samp. The merge step is Chan's pairwise
    * formula, so the result is stable under Spark's arbitrary
    * partial-merge order; 4dp rounding absorbs the ≤1e-9-relative
    * float slack between merge trees. Count and mean ride along from
    * the same pass.
    */
  val q159WelfordVar = GQuery(
    "q159_welford_var",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          round(avg($"value"), 4).as("mean_value"),
          round(graft.functions.Aggregates.welfordVar($"value"), 4)
            .as("var_value"))
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
           |       round(avg(value), 4) AS mean_value,
           |       round(var_samp(value), 4) AS var_value
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** q161 — recursive CTE hierarchy traversal (Spark 4's WITH
    * RECURSIVE, same ANSI text in both engines): BFS from the root of
    * a decimal-tree supplier hierarchy (parent = floor(key/10)),
    * reporting population, key span per level. The self-edge at the
    * root (0 → 0) is excluded in the join or UNION ALL would recurse
    * forever — the standard cycle guard for anchor-containing-parent
    * hierarchies. Spark executes each recursion step as one
    * distributed join (frontier ⋈ table), the same iterate-until-empty
    * loop shape as Dedup.connectedComponents.
    */
  private def q161Sql(supplier: String) =
    s"""WITH RECURSIVE h(k, lvl) AS (
       |  SELECT s_suppkey, 0 FROM $supplier WHERE s_suppkey = 0
       |  UNION ALL
       |  SELECT s.s_suppkey, h.lvl + 1
       |  FROM $supplier s JOIN h
       |    ON CAST(floor(s.s_suppkey / 10.0) AS BIGINT) = h.k
       |   AND s.s_suppkey <> h.k)
       |SELECT lvl, count(*) AS n, min(k) AS min_k, max(k) AS max_k
       |FROM h GROUP BY lvl ORDER BY lvl""".stripMargin

  val q161RecursiveHierarchy = GQuery(
    "q161_recursive_hierarchy",
    (s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("q161_supplier")
      s.sql(q161Sql("q161_supplier"))
    },
    Some(q161Sql("supplier")),
    benchmark = true)

  /** q167 — LATERAL correlated subquery (same ANSI text both
    * engines): per order, the single best lineitem picked by an
    * ORDER BY ... LIMIT 1 subquery that references the outer row.
    * Spark de-correlates this into a ranked join under the hood — the
    * SQL-surface twin of what TopKPerKey does physically.
    */
  private def q167Sql(orders: String, lineitem: String) =
    s"""SELECT o_orderpriority, count(*) AS n,
       |       round(sum(best_price), 2) AS sum_best
       |FROM $orders o,
       |LATERAL (SELECT l_extendedprice AS best_price FROM $lineitem l
       |         WHERE l.l_orderkey = o.o_orderkey
       |         ORDER BY l_extendedprice DESC, l_linenumber LIMIT 1) t
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val q167LateralJoin = GQuery(
    "q167_lateral_join",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("q167_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("q167_lineitem")
      s.sql(q167Sql("q167_orders", "q167_lineitem"))
    },
    Some(q167Sql("orders", "lineitem")))

  /** q168 — null-safe join surface (IS NOT DISTINCT FROM, same ANSI
    * text both engines): a join key with real NULLs (every 5th bucket
    * nullified) must match NULL-to-NULL — the semantics plain `=`
    * silently drops, and the reason the idempotent merge sink uses
    * `<=>` on its PK columns. The NULL class appearing in the output
    * IS the proof the null-keyed rows joined.
    */
  private def q168Sql(orders: String) =
    s"""SELECT COALESCE(CAST(k AS STRING), 'NULL') AS key_class, count(*) AS n
       |FROM (
       |  SELECT nullif(a.o_custkey % 5, 0) AS k
       |  FROM $orders a JOIN $orders b
       |    ON nullif(a.o_custkey % 5, 0) IS NOT DISTINCT FROM nullif(b.o_custkey % 5, 0)
       |   AND a.o_orderkey = b.o_orderkey) t
       |GROUP BY k ORDER BY key_class""".stripMargin

  val q168NullSafeJoin = GQuery(
    "q168_null_safe_join",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("q168_orders")
      s.sql(q168Sql("q168_orders"))
    },
    Some(q168Sql("orders")))

  /** q193 — Misra–Gries heavy hitters per source: top-5 tokens via the
    * native mergeable-summary aggregate ([[graft.functions.MisraGriesAgg]]).
    * k=1024 exceeds the corpus vocabulary, so every estimate is exact
    * and the DuckDB value_counts oracle matches bit-for-bit; the
    * approximation bound under eviction (small k, adversarial skew) is
    * property-tested in HeavyHittersSpec. At 100 TB this shuffles at
    * most k counters per partition — never the distinct-key universe —
    * and the top-5 cut is an array slice of the already-sorted summary,
    * no window.
    */
  val q193HeavyHitters = GQuery(
    "q193_heavy_hitters",
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"source", explode(graft.functions.TextAnalysis.tokens($"text")).as("w"))
      toks.groupBy($"source")
        .agg(graft.functions.HeavyHitters.misraGries($"w", 1024).as("hh"))
        .select($"source", posexplode(slice($"hh", 1, 5)))
        .select($"source", ($"pos" + 1).as("rank"),
          $"col.item".as("item"), $"col.est".as("est"))
        .orderBy($"source", $"rank")
    },
    Some(s"""WITH w AS (SELECT source, unnest(${OracleSql.toksSql}) AS item
            |           FROM documents),
            |c AS (SELECT source, item, count(*) AS est
            |      FROM w GROUP BY source, item),
            |r AS (SELECT source, item, est, row_number() OVER (
            |        PARTITION BY source ORDER BY est DESC, item) AS rank
            |      FROM c)
            |SELECT source, rank, item, est FROM r WHERE rank <= 5
            |ORDER BY source, rank""".stripMargin))

  val all: Seq[GQuery] =
    Seq(q103ExactPercentiles, q104RegressionTrend, q105MovingZscore,
      q106PmiCooccurrence, q107ValueHistogram, q108Pagerank, q109Funnel,
      q110WinsorizedStats, q115MarkovTransitions, q116DriftPsi,
      q137AutocorrLag1, q141TriangleCount, q145EquiDepthHistogram,
      q146ExistsSubquery, q153SetopsSurface, q155MadOutliers,
      q159WelfordVar, q161RecursiveHierarchy, q167LateralJoin,
      q168NullSafeJoin, q193HeavyHitters)
}
