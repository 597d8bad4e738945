package graft.io

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Volumetry report (SURVEY §2.4 A1–A5 + §2.1 S11): per-entity row
  * counts, conditional status splits, percentage-of-total, relation
  * distribution stats and top-10 groups — computed as ONE distributed
  * job per block, with only the final small object serialized on the
  * driver (extractor_polymarket.py:274-364 did all of this in Python
  * dict loops).
  */
object Volumetry {

  /** Per-entity counts (A14) as a DataFrame. */
  def tableCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.all.map { t =>
      Tables.read(spark, sfDir, t)
        .agg(count(lit(1)).as("n_rows")).select(lit(t).as("tbl"), col("n_rows"))
    }.reduce(_ union _)

  /** Status split + pct-of-total over events (A1/A5). */
  def eventSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    // materialized once (lazy, tiny): the pct-of-total cross join
    // consumes `counts` twice, re-scanning the events table for the
    // broadcast total without it
    val counts = e.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("__tot"))))
      .withColumn("pct", round(lit(100.0) * col("n") / col("__tot"), 2))
      .drop("__tot")
  }

  /** Relation stats: groups, avg/max group size, top-10 (A2–A4). */
  def relationStats(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    // materialized once (lazy): summary stats and top-10 are separate
    // actions over the same per-customer aggregate
    val perCustomer = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .localCheckpoint(false)
    val stats = perCustomer.agg(
      count(lit(1)).as("n_groups"),
      round(avg(col("n_orders")), 2).as("avg_per_group"),
      max(col("n_orders")).as("max_per_group"))
    val top10 = perCustomer.orderBy(col("n_orders").desc, col("o_custkey")).limit(10)
    (stats, top10)
  }

  /** Per-column null profile in ONE aggregation pass (a profiler that
    * scans once per table, not once per column), unpivoted to
    * (column_name, n_nulls) rows. */
  def nullProfile(df: DataFrame): DataFrame = {
    val aggs = df.columns.map(c => count(when(col(c).isNull, lit(1))).as(c))
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty, df.columns.map(col), "column_name", "n_nulls")
  }

  /** The full report as a JSON string (driver-side assembly of small
    * aggregated results only). */
  def reportJson(spark: SparkSession, sfDir: String): String = {
    val counts = tableCounts(spark, sfDir).collect()
      .map(r => s""""${r.getString(0)}": ${r.getLong(1)}""").mkString("{", ", ", "}")
    val split = eventSplit(spark, sfDir).collect()
      .map(r => s""""${r.getString(0)}": {"n": ${r.getLong(1)}, "pct": ${r.getDouble(2)}}""")
      .mkString("{", ", ", "}")
    val (statsDf, topDf) = relationStats(spark, sfDir)
    val st = statsDf.collect()(0)
    val top = topDf.collect()
      .map(r => s"""{"o_custkey": ${r.getLong(0)}, "n_orders": ${r.getLong(1)}}""")
      .mkString("[", ", ", "]")
    s"""{"table_counts": $counts,
       | "event_split": $split,
       | "orders_per_customer": {"n_groups": ${st.getLong(0)},
       |   "avg": ${st.getDouble(1)}, "max": ${st.getLong(2)}, "top10": $top}}""".stripMargin
  }
}
