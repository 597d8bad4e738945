package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in for — the canonical
  * "custom operator" tier (SURVEY §7.3 preference (a): composed from
  * existing operators, no custom physical plan needed).
  */
object Temporal {

  /** Keyed backward as-of join (pandas merge_asof / kdb aj semantics):
    * each left row picks the LATEST right row with
    * `rightTs <= leftTs` for the same key, or nulls (left semantics)
    * when no prior right row exists.
    *
    * Distributed shape: tag and union the two sides, shuffle ONCE on
    * the key, and let `last(col, ignoreNulls) OVER (PARTITION BY key
    * ORDER BY ts, side ROWS UNBOUNDED PRECEDING)` carry the right
    * attributes forward — running state inside the per-key sort, no
    * per-row probe, no broadcast requirement, and the window is
    * key-partitioned so nothing funnels to one task. A right row at
    * exactly leftTs sorts BEFORE the left row (side 0 < 1) and is
    * therefore visible, matching DuckDB's inclusive `ON l.ts >= r.ts`.
    *
    * Right rows must be unique per (key, rightTs) — pre-aggregate
    * otherwise, or the carried value is sort-order-dependent.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, carryCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    // the carried attributes ride as ONE struct: last(ignoreNulls) must
    // skip only MISSING right rows, never a matched row whose attribute
    // is legitimately NULL — per-column carries would both resurrect a
    // staler value for that column and stitch one left row from
    // DIFFERENT right rows (row tearing)
    val carryType = org.apache.spark.sql.types.StructType(
      carryCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val l2 = left.select(
      Seq(col(key).as("__k"), col(leftTs).cast("timestamp").as("__ts"), lit(1).as("__side")) ++
        lCols.map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(carryType).as("__r"): _*)
    val r2 = right.select(
      Seq(col(key).as("__k"), col(rightTs).cast("timestamp").as("__ts"), lit(0).as("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        struct(carryCols.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l2.unionByName(r2)
      .select(Seq(col("__side")) ++ lCols.map(c => col(s"__l_$c")) :+
        last(col("__r"), ignoreNulls = true).over(w).as("__r"): _*)
    carried.filter(col("__side") === 1)
      .select(lCols.map(c => col(s"__l_$c").as(c)) ++
        carryCols.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** Interval (range) join: fact rows whose `tsCol` falls inside a
    * range's `[startCol, endCol]`, binned so it never goes all-pairs:
    * each range explodes to the `binSeconds`-wide epoch bins it
    * covers, each fact computes its single bin, the join is an
    * EQUI-join on the bin plus the exact BETWEEN refine. A (fact,
    * range) pair meets in exactly the fact's own bin → no dedup
    * needed. Choose binSeconds ≈ the typical range length: shuffle
    * volume is |facts| + Σ range_len/bin. Overlapping ranges are fine
    * (a fact matches each covering range once). */
  def rangeJoinBinned(facts: DataFrame, ranges: DataFrame, tsCol: String,
      startCol: String, endCol: String, binSeconds: Long): DataFrame = {
    val f = facts.withColumn("__bin",
      floor(unix_timestamp(col(tsCol)) / binSeconds))
    val r = ranges.withColumn("__bin", explode(sequence(
      floor(unix_timestamp(col(startCol)) / binSeconds),
      floor(unix_timestamp(col(endCol)) / binSeconds))))
    f.join(r, Seq("__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }

  /** SCD Type-2 history build from an event stream: collapse each
    * key's consecutive runs of the same attribute value into
    * versioned validity intervals `[valid_from, valid_to)` —
    * `valid_to` null (and `is_current` true) on the open interval.
    * The reference loads dims as point-in-time snapshots
    * (loader_NeonDB.py:370-455); this is the history-preserving
    * variant a warehouse needs when the same pipeline re-runs daily.
    *
    * Distributed shape: two key-partitioned windows over one shuffle
    * of (key, attr, ts) — no global window, no self-join. `tiebreak`
    * must make the per-key order total (a monotonic event id), or
    * run-collapse becomes nondeterministic under equal timestamps.
    */
  def scd2(events: DataFrame, key: String, attr: String, ts: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    events
      .select(col(key), col(attr), col(ts), col(tiebreak))
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // "first row" is detected by position, NOT by __prev being null —
      // a null ATTRIBUTE would otherwise look like a run start forever
      // (runs of nulls must collapse like any other run, null-safely).
      .where(col("__rn") === 1 || !(col("__prev") <=> col(attr)))
      .drop("__rn")
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(attr), col(ts).as("valid_from"),
        col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
  }
}
