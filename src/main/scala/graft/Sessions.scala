package graft

import org.apache.spark.sql.SparkSession

/** Central session tuning so Verify/Bench/tests agree.
  * Mirrors the reference's one Spark config site (spark_cleaner.py:32-47)
  * but sized for real parallelism: AQE on (runtime coalesce + skew
  * handling), shuffle partitions = cores for local mode (200 default is
  * wrong single-JVM), UTC for oracle parity, nanosAsLong because the
  * events table carries parquet TIMESTAMP(NANOS).
  */
object Sessions {
  def tune(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // 64 MB broadcast ceiling (default 10 MB), env-overridable: the
      // threshold is size-ADAPTIVE by construction (a side only
      // broadcasts when its estimate fits), so raising it never
      // broadcasts big tables — it stops a mid-sized dim (orders at
      // sf1: ~24 MB projected) from forcing a sort-merge of the fact
      // side. Matches the repo's existing 64 MB explicit-broadcast
      // policy (Joins.maybeBroadcast, q189's hinted CC labels).
      // Measured: q17 1.72→1.43 s at sf1, q16/q68 mildly better,
      // q130/q181 unchanged; sf0.1 plans unaffected (already under
      // 10 MB). preferSortMergeJoin=false and the AQE shuffled-hash
      // threshold were ALSO tried and REJECTED: q181's within-cell
      // self-join degraded 0.9→4.0 s at sf1.
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", "64m"))
      .config("spark.ui.enabled", "false")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    // withExtensions applies only when THIS call creates the session
    // (getOrCreate ignores it on reuse) — Verify/Bench/tests all build
    // through here first, so SQL DML on graft-delta works everywhere;
    // a foreign session opts in via spark.sql.extensions
    val s = tune(SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.NativeRegistry.register(s)
    s
  }
}
