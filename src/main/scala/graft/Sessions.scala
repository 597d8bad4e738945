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
      // Broadcast threshold stays at Spark's 10 MB default, but
      // env-overridable for cluster tuning. MEASURED before settling
      // (optimization r16): 64m converts only q77/q82's sf1 bucket
      // self-joins SMJ→BHJ — q77 gained ~0.25 s but q82's vector-array
      // broadcast build showed 12 s GC spikes; preferSortMergeJoin=
      // false + the AQE shuffled-hash threshold degraded q181's
      // within-cell self-join 0.9→4.0 s at sf1. Both rejected.
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", "10m"))
      // localCheckpoint blocks are freed by the ContextCleaner only
      // after the driver GCs the RDD wrapper; the default periodic-GC
      // interval (30 min) exceeds a whole Bench/Verify run, so blocks
      // of long-dead per-query checkpoints can sit in the unified
      // memory region competing with live execution memory (driver ==
      // executor in local mode). MEASURED before settling (r17): a
      // 2 min interval injected a full-GC pause into ~3 timed windows
      // per bench run — sentinel spreads rose from 1.15 to 1.5–2.5 on
      // the same host — while the reclaimed blocks never measurably
      // helped (natural young-gen GC already drains the ContextCleaner
      // queue between queries). Kept at Spark's default, overridable
      // for long-lived cluster drivers where dead-block residency
      // actually bites.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("SPARK_GRAFT_PERIODIC_GC", "30min"))
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
