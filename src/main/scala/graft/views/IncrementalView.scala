package graft.views

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite}
import graft.io.DeltaWrite.MergeClauses

/** INCREMENTAL MATERIALIZED AGGREGATE VIEWS over a Delta base table,
  * maintained from the change data feed instead of recomputed.
  *
  * The 100 TB motivation: a grouped aggregate over the whole lake
  * costs a full scan every time it is refreshed, but the change feed
  * ([[DeltaRead.changesBetween]]) bounds each refresh by the data that
  * actually CHANGED since the last one. A view over `(lang)` with
  * count/sum columns refreshes in O(changed rows) — the difference
  * between a nightly 100 TB recompute and a minutely fold of one
  * commit's files. This is the same maintenance model lakehouse
  * materialized views use (delete-aware delta folding), built on two
  * graft primitives: the reconstructed/cdc change feed and the
  * SetTransaction-marked [[DeltaWrite.merge]].
  *
  * Aggregate algebra per group key:
  *  - `cnt`      — always present; Δ = #inserts − #deletes. A key
  *    reaching cnt 0 is DELETED from the view (matching what a
  *    recompute would produce — no ghost groups).
  *  - `sum_<c>`  — Δ = Σ insert values − Σ delete values. Nulls are
  *    ignored on both sides, exactly like SQL SUM. Averages are
  *    derived (`sum_<c> / cnt`) rather than stored.
  *  - `min_<c>` / `max_<c>` — inserts fold incrementally
  *    (`least`/`greatest`); a DELETE can evict the current extreme,
  *    which no incremental algebra can repair, so keys touched by any
  *    delete are RECOMPUTED — but only those keys, via a semi-join
  *    pruned scan of the base head. Partial recompute, not full.
  *
  * Caveats by contract: group keys must be non-null (SQL GROUP BY
  * groups nulls, but MERGE's key join cannot match them — a null key
  * is refused loudly at build and refresh); floating-point `sum_<c>`
  * columns drift from a from-scratch recompute by reassociation, so
  * exact-match views should sum integral columns (the usual fixed
  * -decimal-as-integer-units trick applies).
  *
  * Exactly-once: every refresh lands as ONE merge commit carrying a
  * SetTransaction (appId derived from the base path, version = the
  * base head version folded). A crashed/replayed refresh re-reads the
  * mark and skips; two racing refreshes resolve inside merge's commit
  * CAS. Reference: the reference pipeline's gold-layer loads recompute
  * aggregate tables from silver on every run
  * (loader_NeonDB.py:682-882) — this operator is the incremental form
  * of the same tables. */
object IncrementalView {

  /** The view definition: group keys + the aggregated columns.
    * `sums`, `minMaxes` and `approxDistincts` name BASE columns; the
    * view materializes them as `sum_<c>`, `min_<c>`/`max_<c>` and
    * `hll_<c>` alongside `cnt`.
    *
    * `approxDistincts` columns store a Datasketches HLL sketch
    * (`hll_sketch_agg`) per group — the canonical 100 TB daily-uniques
    * materialization: INSERTS fold losslessly (`hll_union` takes the
    * elementwise register max, so a union of per-batch sketches equals
    * the sketch of the union), while DELETES cannot be subtracted from
    * an HLL and mark the key dirty for a semi-join-pruned recompute,
    * exactly like min/max. Read estimates off the view with
    * `hll_sketch_estimate(hll_<c>)`. NOTE on comparing against a
    * from-scratch sketch: the fold is lossless at the REGISTER level,
    * but DataSketches' raw estimate is build-path-dependent — a
    * directly-streamed sketch uses the HIP accumulator, any
    * union-built sketch the composite estimator — so once a sketch
    * leaves exact mode the two can report different numbers over
    * identical registers. Canonicalize both sides through a self-union
    * (`hll_sketch_estimate(hll_union(s, s))`) when asserting equality
    * (see q222). */
  final case class ViewSpec(keys: Seq[String], sums: Seq[String] = Nil,
      minMaxes: Seq[String] = Nil, approxDistincts: Seq[String] = Nil) {
    require(keys.nonEmpty, "ViewSpec: keys must be non-empty")
    require(sums.distinct.size == sums.size &&
      minMaxes.distinct.size == minMaxes.size && keys.distinct.size == keys.size &&
      approxDistincts.distinct.size == approxDistincts.size,
      "ViewSpec: duplicate column within a list")
    private val made = "cnt" +: (sums.map("sum_" + _) ++
      minMaxes.flatMap(c => Seq("min_" + c, "max_" + c)) ++
      approxDistincts.map("hll_" + _))
    require(keys.intersect(made).isEmpty && made.distinct.size == made.size,
      "ViewSpec: a key collides with a generated view column name")
  }

  private def appId(base: String): String =
    "graft-iview:" + Paths.get(base).toAbsolutePath.normalize.toString

  /** The full aggregate of `df` under `spec` — the bootstrap form and
    * the per-dirty-key recompute form share it. */
  private def aggregate(df: DataFrame, spec: ViewSpec): DataFrame = {
    val aggs = Seq(count(lit(1)).as("cnt")) ++
      spec.sums.map(c => sum(col(c)).as(s"sum_$c")) ++
      spec.minMaxes.flatMap(c =>
        Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      spec.approxDistincts.map(c => hll_sketch_agg(col(c)).as(s"hll_$c"))
    df.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def requireKeysNotNull(df: DataFrame, spec: ViewSpec, who: String): Unit = {
    val nullKey = df.where(spec.keys.map(col(_).isNull).reduce(_ || _)).limit(1)
    require(nullKey.isEmpty,
      s"$who: null group key — MERGE key joins cannot match nulls; " +
        "filter or coalesce null keys before viewing")
  }

  /** Bootstrap `view` as the full aggregate of `base` at its current
    * head, stamping the resume mark. Returns the base version the view
    * now reflects. */
  def build(spark: SparkSession, base: String, view: String,
      spec: ViewSpec): Long = {
    require(!Files.isDirectory(Paths.get(view, "_delta_log")),
      s"build: $view already exists — refresh() maintains it")
    val head = DeltaRead.latestVersion(base)
    val snap = DeltaRead.readVersion(spark, base, head)
    requireKeysNotNull(snap, spec, "build")
    DeltaWrite.appendOnce(aggregate(snap, spec), view, appId(base), head)
    head
  }

  /** Fold everything `base` committed since the last build/refresh
    * into `view` as ONE exactly-once merge commit. Returns the base
    * head version now reflected, or None when already current.
    *
    * `microBatch` is [[maintainStream]]'s fold path: the rows a CDF
    * micro-batch ALREADY read (feed schema — data columns + the two
    * change metadata columns) fold directly, so each commit's files
    * are read once per trigger instead of twice (the r14 shape
    * re-read the same range from the log and used the batch as a
    * doorbell). The view's SetTransaction mark stays the source of
    * truth: batch rows at or below the mark are dropped (checkpoint
    * -loss replays fold to no-ops), and a batch whose window STARTS
    * past mark+1 — a stream attached after the mark fell behind —
    * falls back to the authoritative log read rather than skip
    * versions. */
  def refresh(spark: SparkSession, base: String, view: String,
      spec: ViewSpec, microBatch: Option[DataFrame] = None): Option[Long] = {
    val app = appId(base)
    val from = DeltaWrite.lastTxnVersion(spark, view, app).getOrElse(
      throw new IllegalStateException(
        s"refresh: $view carries no resume mark for $base — build() first"))
    val vc = col(DeltaRead.CommitVersionCol)
    val (head, changes) = microBatch match {
      case Some(b) =>
        val bounds = b.agg(min(vc), max(vc)).collect()(0)
        if (bounds.isNullAt(1)) return None // empty trigger — nothing to fold
        val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
        if (hi <= from) return None // pure replay — the mark absorbed it
        if (lo > from + 1)
          // the batch window starts past the mark: folding it alone
          // would skip (from, lo) — read the authoritative log instead
          (hi, DeltaRead.changesBetween(spark, base, from, hi))
        else (hi, b.where(vc > from))
      case None =>
        val h = DeltaRead.latestVersion(base)
        if (h <= from) return None
        (h, DeltaRead.changesBetween(spark, base, from, h))
    }
    val ct = col(DeltaRead.ChangeTypeCol)
    requireKeysNotNull(changes, spec, "refresh")
    // per-key deltas over the whole range at once: count and sum
    // deltas commute across versions, and min/max dirtiness only needs
    // "was any row of this key deleted" (the recompute below reads the
    // HEAD snapshot, so intermediate churn is irrelevant)
    val deltaAggs = Seq(
      sum(when(ct === "insert", 1L).otherwise(-1L)).as("__dcnt")) ++
      spec.sums.map(c => sum(when(ct === "insert", col(c)).otherwise(-col(c)))
        .as(s"__dsum_$c")) ++
      spec.minMaxes.map(c => min(when(ct === "insert", col(c))).as(s"__imin_$c")) ++
      spec.minMaxes.map(c => max(when(ct === "insert", col(c))).as(s"__imax_$c")) ++
      // the range's inserted values as one sketch per key (nulls and
      // delete rows contribute nothing, like every aggregate here)
      spec.approxDistincts.map(c =>
        hll_sketch_agg(when(ct === "insert", col(c))).as(s"__ihll_$c")) ++
      Seq(max(when(ct === "delete", 1).otherwise(0)).as("__hasdel"))
    val delta = changes.groupBy(spec.keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val cur = DeltaRead.read(spark, view)
      .select(col("cnt").as("__cur_cnt") +:
        (spec.sums.map(c => col(s"sum_$c").as(s"__cur_sum_$c")) ++
          spec.minMaxes.flatMap(c => Seq(col(s"min_$c").as(s"__cur_min_$c"),
            col(s"max_$c").as(s"__cur_max_$c"))) ++
          spec.approxDistincts.map(c => col(s"hll_$c").as(s"__cur_hll_$c")) ++
          spec.keys.map(col)): _*)
    // a delete may have evicted a key's min/max, and can also drive a
    // SUM back to "all remaining values null" — a state the signed
    // delta cannot represent (5 + (−5) = 0, but SQL SUM over the
    // survivors is NULL). So delete-touched keys recompute their sums
    // AND extremes exactly from the base head, semi-join pruned
    // (partition and stats pruning apply to the pushed key filter
    // where the layout allows; the scan is bounded by the dirty keys'
    // files, never the full lake). Counts stay incremental — they are
    // exact by algebra alone.
    // the recompute machinery only engages when the range actually
    // CONTAINS a delete — the common append-only refresh of a
    // sum-only view must not plan a base-head join at all (the dirty
    // probe is one small aggregation over the already-grouped delta)
    val needRecompute = (spec.minMaxes.nonEmpty || spec.sums.nonEmpty ||
      spec.approxDistincts.nonEmpty) &&
      !delta.where(col("__hasdel") === 1).isEmpty
    val recomputed =
      if (!needRecompute) None
      else {
        val dirty = delta.where(col("__hasdel") === 1)
          .select(spec.keys.map(col): _*)
        Some(aggregate(
          DeltaRead.readVersion(spark, base, head)
            // no broadcast hint: the dirty set is usually tiny (AQE
            // will broadcast it) but a mass-delete could make it huge
            .join(dirty, spec.keys, "left_semi"), spec)
          .select(spec.keys.map(col) ++
            spec.sums.map(c => col(s"sum_$c").as(s"__r_sum_$c")) ++
            spec.minMaxes.flatMap(c =>
              Seq(col(s"min_$c").as(s"__r_min_$c"),
                col(s"max_$c").as(s"__r_max_$c"))) ++
            spec.approxDistincts.map(c => col(s"hll_$c").as(s"__r_hll_$c")): _*))
      }
    val joined0 = delta.join(cur, spec.keys, "left")
    val joined = recomputed.fold(joined0)(r => joined0.join(r, spec.keys, "left"))
    val dirtyFlag = col("__hasdel") === 1
    // when no delete exists in the range the recompute frame (and its
    // __r_* columns) was never built; dirtyFlag is then false on every
    // row, so the dirty branch may reference a typed null instead
    def rCol(name: String): Column =
      if (recomputed.isDefined) col(name) else lit(null)
    val outCols: Seq[Column] = spec.keys.map(col) ++
      Seq((coalesce(col("__cur_cnt"), lit(0L)) + col("__dcnt")).as("cnt")) ++
      spec.sums.map(c =>
        // dirty keys take the exact recompute; clean keys fold the
        // three-way null algebra of SQL SUM: both-null stays null,
        // otherwise nulls read as the additive identity
        when(dirtyFlag, rCol(s"__r_sum_$c")).otherwise(
          when(col(s"__cur_sum_$c").isNull && col(s"__dsum_$c").isNull, lit(null))
            .otherwise(coalesce(col(s"__cur_sum_$c"), lit(0L).cast("long")) +
              coalesce(col(s"__dsum_$c"), lit(0L).cast("long")))).as(s"sum_$c")) ++
      spec.minMaxes.flatMap { c =>
        Seq(
          when(dirtyFlag, rCol(s"__r_min_$c"))
            .otherwise(least(col(s"__cur_min_$c"), col(s"__imin_$c"))).as(s"min_$c"),
          when(dirtyFlag, rCol(s"__r_max_$c"))
            .otherwise(greatest(col(s"__cur_max_$c"), col(s"__imax_$c"))).as(s"max_$c"))
      } ++
      spec.approxDistincts.map { c =>
        val cur = col(s"__cur_hll_$c"); val ins = col(s"__ihll_$c")
        // inserts union losslessly (register max); either side absent
        // falls back to the other — hll_union itself nulls on one null
        when(dirtyFlag, rCol(s"__r_hll_$c").cast("binary")).otherwise(
          when(cur.isNull, ins).otherwise(
            when(ins.isNull, cur).otherwise(hll_union(cur, ins)))).as(s"hll_$c")
      }
    val next = joined.select(outCols: _*)
    // the view trusting its own arithmetic is the failure mode: a key
    // counting below zero means the mark and the view disagree
    // (someone wrote the view out-of-band) — refuse, don't fold
    require(next.where(col("cnt") < 0).isEmpty,
      s"refresh: $view is out of sync with $base (negative group count) — " +
        "rebuild the view")
    DeltaWrite.merge(spark, view, next, spec.keys,
      clauses = MergeClauses(
        deleteWhen = Some(col("cnt") === 0),
        updateWhen = Some(col("cnt") > 0),
        insertWhen = Some(col("cnt") > 0)),
      txn = Some((app, head)))
    Some(head)
  }

  /** CONTINUOUS view maintenance: tail `base`'s change feed as a
    * Structured Streaming query and fold every micro-batch into `view`
    * with [[refresh]]. The batch's ROWS are the fold input — each
    * commit's files are read once per trigger, not re-read from the
    * log — while the view's own SetTransaction mark (not the stream
    * checkpoint) stays the exactly-once source of truth: a restarted
    * stream, a lost checkpoint, or an overlapping manual refresh()
    * all replay to no-ops instead of double-counting, and a batch
    * window that starts past the mark falls back to the authoritative
    * log read inside [[refresh]]. One merge commit per trigger at
    * most; `availableNow = true` drains the backlog and stops (the
    * batch-job-shaped catch-up). */
  def maintainStream(spark: SparkSession, base: String, view: String,
      spec: ViewSpec, checkpoint: String, availableNow: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.Trigger
    val feed = spark.readStream.format("graft-delta-cdf").load(base)
    val w = feed.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        refresh(spark, base, view, spec, microBatch = Some(batch)); ()
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
