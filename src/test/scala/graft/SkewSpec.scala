package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Skew validation at scale (SURVEY §7.4 #6: the reference's top tag
  * sits on 66% of events — volumetry_report.json:38-79): the three
  * mitigation layers are each proven against a deliberately ~100×
  * skewed fixture.
  *
  *  1. the explicit salted join: correct AND actually splits the hot
  *     key's work saltFactor-ways (task-size bound, not just equality);
  *  2. AQE's skew-join rewrite: fires on the sort-merge shape (the
  *     plan the engine falls back to when nothing is broadcastable);
  *  3. the bridge joins (q65–q68 shape): broadcast by construction, so
  *     a hot tag CANNOT concentrate a shuffle partition — there is no
  *     shuffle of the fact before the aggregate at all.
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  /** ~100× skew: 300k rows on one key, 100k spread over 1000 keys
    * (hot ≈ 3000× the median key, ≈ 75% of all rows — harsher than
    * the reference's 66%). Padding makes shuffle bytes, not just row
    * counts, skewed. */
  private def skewedFact(n: Long = 400000L) =
    spark.range(n).select(
      when($"id" < (n * 3 / 4), lit("hot"))
        .otherwise(concat(lit("k"), ($"id" % 1000).cast("string"))).as("key"),
      $"id".as("val"),
      lpad($"id".cast("string"), 40, "x").as("pad"))

  test("salted join equals the plain join AND splits the hot key's work saltFactor-ways") {
    val big = skewedFact(40000L)
    val dim = (Seq("hot") ++ (0 until 50).map("k" + _))
      .map(k => (k, s"name_$k")).toDF("key", "name")
    val plain = big.join(dim, Seq("key")).groupBy($"key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(big, dim, "key", saltFactor = 8)
      .groupBy($"key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain, "salting must not change join semantics")

    // the task-size bound: no (key, salt) bucket may hold more than
    // ~2× the ideal hot/saltFactor share (rand salt is uniform-ish)
    val hot = plain("hot")
    val maxBucket = big.withColumn("__salt", (rand(42) * 8).cast("int"))
      .groupBy($"key", $"__salt").count()
      .agg(max($"count")).collect()(0).getLong(0)
    assert(maxBucket <= hot * 2 / 8 + 1,
      s"hot key must split ~8 ways: largest bucket $maxBucket of $hot")

    // saltedCount (two-phase aggregate) agrees with the direct count
    val sc = Skew.saltedCount(big, "key", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = big.groupBy($"key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sc == direct)
  }

  test("AQE skew-join rewrite fires on the sort-merge fallback shape") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "131072")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fact (hot FK) ⋈ unique-key dim: output stays linear in the
      // fact, so the skewed side is the only oversized partition
      val big = skewedFact(100000L)
      val dim = (Seq("hot") ++ (0 until 1000).map("k" + _))
        .map(k => (k, s"name_$k")).toDF("key", "name")
      val joined = big.join(dim, Seq("key"))
      // collect() executes THIS QueryExecution (count()/foreach() plan
      // a different one whose AQE state we can't inspect) — only a
      // finalized plan shows the skew split
      assert(joined.collect().length == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot-key SMJ partitions skewed; plan:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bridge-join rollup (q68 shape) broadcasts both hops: no fact shuffle for skew to concentrate") {
    val df = graft.queries.StarQueries.q68TagRevenue.run(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "bridge + dim must broadcast at this scale")
    assert(!plan.contains("SortMergeJoin"),
      s"the fact must not sort-merge-shuffle before the aggregate:\n${plan.take(2000)}")
  }
}
