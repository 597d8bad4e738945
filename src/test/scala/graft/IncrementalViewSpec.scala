package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite}
import graft.views.IncrementalView
import graft.views.IncrementalView.ViewSpec

/** Incremental materialized aggregate views: every refresh must leave
  * the view EQUAL to a from-scratch recompute of the base head —
  * across appends, DV deletes, merges, and maintenance — while doing
  * only delta-bounded work, exactly once under replay. */
class IncrementalViewSpec extends SparkTestBase {
  import spark.implicits._

  private def newDir(tag: String): String =
    Files.createTempDirectory(tag).toString
  private def cleanup(ts: String*): Unit = ts.foreach(t =>
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(t)))

  private val vspec =
    ViewSpec(keys = Seq("k"), sums = Seq("v"), minMaxes = Seq("v"))

  private def recompute(base: String): DataFrame =
    DeltaRead.read(spark, base).groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"),
        min($"v").as("min_v"), max($"v").as("max_v"))

  private def assertViewMatches(base: String, view: String): Unit = {
    val got = DeltaRead.read(spark, view)
      .select($"k", $"cnt", $"sum_v", $"min_v", $"max_v")
      .orderBy($"k").collect().toSeq
    val want = recompute(base).orderBy($"k").collect().toSeq
    assert(got == want, s"view diverged:\n got=$got\nwant=$want")
  }

  test("build == full recompute; refresh folds appends, deletes, merges") {
    val base = newDir("ivbase"); val view = newDir("ivview")
    cleanup(view) // build requires absence
    try {
      DeltaWrite.append(Seq(("a", 1L), ("a", 5L), ("b", 10L)).toDF("k", "v"), base)
      IncrementalView.build(spark, base, view, vspec)
      assertViewMatches(base, view)
      // append: new key + growth of an existing one
      DeltaWrite.append(Seq(("b", 2L), ("c", 7L), ("c", 7L)).toDF("k", "v"), base)
      assert(IncrementalView.refresh(spark, base, view, vspec).isDefined)
      assertViewMatches(base, view)
      // DV delete evicting a's MAX (5) — min/max must recompute
      DeltaWrite.deleteWhere(spark, base, $"k" === "a" && $"v" === 5L)
      assert(IncrementalView.refresh(spark, base, view, vspec).isDefined)
      assertViewMatches(base, view)
      // merge: update b's 10 → 3 (delete+insert in the feed), insert d
      DeltaWrite.merge(spark, base,
        Seq(("b", 10L, 3L), ("d", 4L, 4L)).toDF("k", "v", "nv")
          .select($"k", $"nv".as("v")),
        keys = Seq("k"))
      assert(IncrementalView.refresh(spark, base, view, vspec).isDefined)
      // b had rows (10, 2) — merge on k rewrites BOTH matched rows to
      // v=3, so the recompute comparison also covers multiplicity
      assertViewMatches(base, view)
    } finally cleanup(base, view)
  }

  test("a key deleted to zero rows leaves the view (no ghost groups)") {
    val base = newDir("ivbase"); val view = newDir("ivview")
    cleanup(view)
    try {
      DeltaWrite.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), base)
      IncrementalView.build(spark, base, view, vspec)
      DeltaWrite.deleteWhere(spark, base, $"k" === "a")
      IncrementalView.refresh(spark, base, view, vspec)
      assert(DeltaRead.read(spark, view).select($"k").as[String]
        .collect().toSeq == Seq("b"))
      assertViewMatches(base, view)
      // and a key born+killed INSIDE one refresh window never appears
      DeltaWrite.append(Seq(("e", 9L)).toDF("k", "v"), base)
      DeltaWrite.deleteWhere(spark, base, $"k" === "e")
      IncrementalView.refresh(spark, base, view, vspec)
      assert(!DeltaRead.read(spark, view).where($"k" === "e").collect().nonEmpty)
      assertViewMatches(base, view)
    } finally cleanup(base, view)
  }

  test("refresh is exactly-once: replay no-ops, crash-replay cannot double-fold") {
    val base = newDir("ivbase"); val view = newDir("ivview")
    cleanup(view)
    try {
      DeltaWrite.append(Seq(("a", 1L)).toDF("k", "v"), base)
      IncrementalView.build(spark, base, view, vspec)
      DeltaWrite.append(Seq(("a", 2L)).toDF("k", "v"), base)
      assert(IncrementalView.refresh(spark, base, view, vspec).contains(1L))
      // already-current: short-circuits before any work
      assert(IncrementalView.refresh(spark, base, view, vspec).isEmpty)
      // simulate the crash-replay: call merge AGAIN with the same
      // delta and the same txn mark — the mark must make it a no-op
      val dup = DeltaRead.read(spark, view)
        .withColumn("cnt", $"cnt" + 100L) // poison: would corrupt if applied
      val vBefore = DeltaRead.latestVersion(view)
      DeltaWrite.merge(spark, view, dup, Seq("k"),
        txn = Some(("graft-iview:" +
          java.nio.file.Paths.get(base).toAbsolutePath.normalize.toString, 1L)))
      assert(DeltaRead.latestVersion(view) == vBefore, "replayed merge must skip")
      assertViewMatches(base, view)
    } finally cleanup(base, view)
  }

  test("OPTIMIZE on the base surfaces no changes; sums stay null-correct") {
    val base = newDir("ivbase"); val view = newDir("ivview")
    cleanup(view)
    try {
      val rows = Seq(("a", Some(1L)), ("a", None), ("n", None))
        .toDF("k", "v")
      DeltaWrite.append(rows, base)
      DeltaWrite.append(Seq(("a", 3L)).toDF("k", "v"), base)
      IncrementalView.build(spark, base, view, vspec)
      // all-null group: SUM/MIN/MAX null, cnt counts rows
      assertViewMatches(base, view)
      DeltaWrite.compact(spark, base)
      val r = IncrementalView.refresh(spark, base, view, vspec)
      // compaction is dataChange=false: feed empty, but the mark still
      // advances so the next refresh doesn't re-walk the commit
      assert(r.isDefined)
      assertViewMatches(base, view)
    } finally cleanup(base, view)
  }

  test("deleting the last non-null value returns the sum to NULL, not 0") {
    val base = newDir("ivbase"); val view = newDir("ivview"); cleanup(view)
    try {
      DeltaWrite.append(Seq(("a", Option(5L)), ("a", None), ("a", None))
        .toDF("k", "v"), base)
      IncrementalView.build(spark, base, view, vspec)
      DeltaWrite.deleteWhere(spark, base, $"v" === 5L)
      IncrementalView.refresh(spark, base, view, vspec)
      // survivors are two all-null rows: SUM is NULL (a signed delta
      // alone would leave 0 — the recompute path must win)
      val r = DeltaRead.read(spark, view).where($"k" === "a")
        .select($"cnt", $"sum_v", $"min_v", $"max_v").collect()(0)
      assert(r.getLong(0) == 2L && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
        s"expected (2, null, null, null), got $r")
      assertViewMatches(base, view)
    } finally cleanup(base, view)
  }

  test("streaming-triggered maintenance: a readStream drives refresh to convergence") {
    val base = newDir("ivbase"); val view = newDir("ivview"); cleanup(view)
    val ckpt = newDir("ivckpt"); cleanup(ckpt)
    try {
      DeltaWrite.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), base)
      IncrementalView.build(spark, base, view, vspec)
      DeltaWrite.append(Seq(("a", 5L), ("c", 7L)).toDF("k", "v"), base)
      DeltaWrite.deleteWhere(spark, base, $"k" === "b")
      // the CDF stream is the TRIGGER; refresh() reads the
      // authoritative feed itself and its SetTransaction mark makes
      // re-triggers (including checkpoint replays) idempotent
      def run(checkpoint: String = ckpt): Unit = {
        val q = IncrementalView.maintainStream(spark, base, view, vspec,
          checkpoint, availableNow = true)
        q.awaitTermination(60000); q.stop()
      }
      run()
      assertViewMatches(base, view)
      // commits while the query is down; a RESTART folds only them
      DeltaWrite.merge(spark, base, Seq(("a", 9L)).toDF("k", "v"), Seq("k"))
      DeltaWrite.append(Seq(("d", 3L)).toDF("k", "v"), base)
      run()
      assertViewMatches(base, view)
      // CHECKPOINT LOSS: a fresh checkpoint replays the feed from
      // genesis, but the view's own mark absorbs the replay — then
      // folds the genuinely new commit exactly once
      DeltaWrite.append(Seq(("e", 11L)).toDF("k", "v"), base)
      val ckpt2 = newDir("ivckpt2"); cleanup(ckpt2)
      try { run(ckpt2); assertViewMatches(base, view) }
      finally cleanup(ckpt2)
    } finally cleanup(base, view, ckpt)
  }

  test("maintainStream folds the batch ROWS: one log change-read per range, never two") {
    val base = newDir("ivbase"); val view = newDir("ivview"); cleanup(view)
    val ckpt = newDir("ivckpt"); cleanup(ckpt)
    val reads = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    try {
      DeltaWrite.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), base)
      IncrementalView.build(spark, base, view, vspec)
      DeltaWrite.append(Seq(("a", 5L), ("c", 7L)).toDF("k", "v"), base)
      DeltaWrite.deleteWhere(spark, base, $"k" === "b")
      DeltaRead.onLogChangesRead = Some { (t, since, until) =>
        // the schema probe is an empty (head, head] range — not a read
        if (t == base && since < until) reads.add((since, until)); ()
      }
      val q = IncrementalView.maintainStream(spark, base, view, vspec,
        ckpt, availableNow = true)
      q.awaitTermination(60000); q.stop()
      assertViewMatches(base, view)
      val got = reads.asScala.toList
      // the r14 shape read every range TWICE (the CDF source builds the
      // batch, then refresh() re-read the same range as the fold input);
      // the fold now consumes the batch rows, so each range reads once
      assert(got.nonEmpty, "the source itself must have read the feed")
      assert(got.distinct.size == got.size,
        s"a repeated range means the fold re-read what the batch carried: $got")
    } finally {
      DeltaRead.onLogChangesRead = None
      cleanup(base, view, ckpt)
    }
  }

  test("a stream checkpoint AHEAD of the view's mark falls back to the log, skipping nothing") {
    val base = newDir("ivbase")
    val viewA = newDir("ivviewa"); val viewB = newDir("ivviewb")
    cleanup(viewA, viewB)
    val ckpt = newDir("ivckpt"); cleanup(ckpt)
    try {
      DeltaWrite.append(Seq(("a", 1L)).toDF("k", "v"), base)
      // B's mark freezes here; A keeps consuming through the checkpoint
      IncrementalView.build(spark, base, viewB, vspec)
      IncrementalView.build(spark, base, viewA, vspec)
      DeltaWrite.append(Seq(("b", 2L)).toDF("k", "v"), base)
      def run(view: String): Unit = {
        val q = IncrementalView.maintainStream(spark, base, view, vspec,
          ckpt, availableNow = true)
        q.awaitTermination(60000); q.stop()
      }
      run(viewA) // checkpoint now consumed the ("b",2) commit
      DeltaWrite.append(Seq(("c", 3L)).toDF("k", "v"), base)
      // the checkpoint resumes past ("b",2), but B never folded it: the
      // batch window starts past B's mark + 1 → refresh must read the
      // log for the full (mark, head] range, not fold the partial batch
      run(viewB)
      assertViewMatches(base, viewB)
    } finally cleanup(base, viewA, viewB, ckpt)
  }

  test("null group keys refuse loudly; out-of-band view edits refuse on fold") {
    val base = newDir("ivbase"); val view = newDir("ivview")
    cleanup(view)
    try {
      DeltaWrite.append(Seq((Option.empty[String], 1L)).toDF("k", "v"), base)
      val e = intercept[IllegalArgumentException] {
        IncrementalView.build(spark, base, view, vspec)
      }
      assert(e.getMessage.contains("null group key"))
    } finally cleanup(base, view)
    val base2 = newDir("ivbase"); val view2 = newDir("ivview")
    cleanup(view2)
    try {
      DeltaWrite.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), base2)
      IncrementalView.build(spark, base2, view2, vspec)
      // sabotage: delete a's view row out-of-band, then delete a's base
      // row — the fold would drive cnt to -1; must refuse, not write
      DeltaWrite.deleteWhere(spark, view2, $"k" === "a")
      DeltaWrite.deleteWhere(spark, base2, $"k" === "a")
      val e2 = intercept[IllegalArgumentException] {
        IncrementalView.refresh(spark, base2, view2, vspec)
      }
      assert(e2.getMessage.contains("out of sync"))
    } finally cleanup(base2, view2)
  }

  // --- approxDistincts: HLL sketch columns ---

  private val hspec = ViewSpec(keys = Seq("k"), approxDistincts = Seq("u"))

  /** Estimates off the view vs a from-scratch sketch of the base head.
    * Equality is EXACT: hll_union takes the elementwise register max,
    * so a union of per-batch sketches carries the same registers as
    * one sketch over all the data. */
  private def assertHllMatches(base: String, view: String): Unit = {
    val got = DeltaRead.read(spark, view)
      .select($"k", hll_sketch_estimate($"hll_u").as("est"))
      .orderBy($"k").collect().toSeq
    val want = DeltaRead.read(spark, base).groupBy($"k")
      .agg(hll_sketch_estimate(hll_sketch_agg($"u")).as("est"))
      .orderBy($"k").collect().toSeq
    assert(got == want, s"hll view diverged:\n got=$got\nwant=$want")
  }

  test("approxDistincts: inserts fold via hll_union, lossless vs recompute") {
    val base = newDir("ivhbase"); val view = newDir("ivhview")
    cleanup(view)
    try {
      DeltaWrite.append((0 until 500).map(i => (s"k${i % 3}", i.toLong % 200))
        .toDF("k", "u"), base)
      IncrementalView.build(spark, base, view, hspec)
      assertHllMatches(base, view)
      // overlapping + new values, plus a brand-new key
      DeltaWrite.append(((150 until 700).map(i => (s"k${i % 3}", i.toLong)) ++
        Seq(("fresh", 1L), ("fresh", 1L), ("fresh", 2L))).toDF("k", "u"), base)
      assert(IncrementalView.refresh(spark, base, view, hspec).isDefined)
      assertHllMatches(base, view)
      // the estimate is sane in absolute terms too: "fresh" has 2 uniques
      val freshEst = DeltaRead.read(spark, view).where($"k" === "fresh")
        .select(hll_sketch_estimate($"hll_u")).head.getLong(0)
      assert(freshEst == 2L)
    } finally cleanup(base, view)
  }

  test("approxDistincts: a delete marks the key dirty and recomputes its sketch") {
    val base = newDir("ivhdbase"); val view = newDir("ivhdview")
    cleanup(view)
    try {
      DeltaWrite.append((0 until 300).map(i => (s"k${i % 2}", i.toLong))
        .toDF("k", "u"), base)
      IncrementalView.build(spark, base, view, hspec)
      // delete most of k0's values: an HLL cannot subtract, so the key
      // must recompute — its estimate must DROP, and k1 stays folded
      DeltaWrite.deleteWhere(spark, base, $"k" === "k0" && $"u" >= 20L)
      assert(IncrementalView.refresh(spark, base, view, hspec).isDefined)
      assertHllMatches(base, view)
      val k0Est = DeltaRead.read(spark, view).where($"k" === "k0")
        .select(hll_sketch_estimate($"hll_u")).head.getLong(0)
      assert(k0Est == 10L, s"k0 kept u in {0,2,..,18}: 10 uniques, got $k0Est")
    } finally cleanup(base, view)
  }
}
