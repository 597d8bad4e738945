package graft

import org.apache.spark.sql.functions._

import graft.io.{DeltaRead, DeltaWrite, Staging}
import graft.io.DeltaWrite.{MergeDeleteWhen, MergeInsertWhen, MergeUpdateWhen, mergeSrc}

/** [[DeltaWrite.mergeAdvanced]] — the general three-population merge:
  * partial SET over both rows, ordered first-match-wins clauses,
  * NOT MATCHED BY SOURCE, partial INSERT, CDC exactness, and the
  * touched-file discipline that keeps it O(touched) at 100 TB. */
class MergeAdvancedSpec extends SparkTestBase {
  import spark.implicits._

  test("partial SET updates named columns, keeps the rest, RHS sees both rows") {
    val t = Staging.tempDir("graft_ma1_")
    DeltaWrite.append(Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"))
      .toDF("id", "v", "s"), t)
    val src = Seq((1L, 100L), (3L, 300L), (9L, 900L)).toDF("id", "nv")
    DeltaWrite.mergeAdvanced(spark, t, src, Seq("id"),
      matched = Seq(MergeUpdateWhen(None,
        Seq("v" -> (col("v") + mergeSrc("nv"))))),
      notMatched = Seq(MergeInsertWhen(None,
        Seq("id" -> col("id"), "v" -> col("nv")))))
    val out = DeltaRead.read(spark, t).as[(Long, Long, Option[String])]
      .collect().toSet
    assert(out == Set((1L, 110L, Some("a")), (2L, 20L, Some("b")),
      (3L, 330L, Some("c")), (9L, 900L, None)),
      "updated v = pre-image + source; s kept; unnamed INSERT column null")
  }

  test("ordered clauses are first-match-wins; conditions may reference the target") {
    val t = Staging.tempDir("graft_ma2_")
    DeltaWrite.append(spark.range(10).select($"id", $"id".as("v")), t)
    val src = spark.range(10).select($"id", ($"id" * 10).as("d"))
    DeltaWrite.mergeAdvanced(spark, t, src, Seq("id"),
      matched = Seq(
        MergeDeleteWhen(Some(col("v") >= 8)),
        MergeUpdateWhen(Some(mergeSrc("d") >= 50), Seq("v" -> (col("v") * 100))),
        MergeUpdateWhen(None, Seq("v" -> lit(-1L)))))
    val out = DeltaRead.read(spark, t).as[(Long, Long)].collect().toMap
    assert(!out.contains(8L) && !out.contains(9L), "first clause deletes v>=8")
    assert((5L to 7L).forall(i => out(i) == i * 100), "second clause takes 5..7")
    assert((0L to 4L).forall(i => out(i) == -1L), "fallthrough updates the rest")
  }

  test("NOT MATCHED BY SOURCE: the full-sync shape") {
    val t = Staging.tempDir("graft_ma3_")
    DeltaWrite.append(spark.range(10).select($"id", lit("live").as("s")), t)
    val src = spark.range(5).select($"id")
    DeltaWrite.mergeAdvanced(spark, t, src, Seq("id"),
      matched = Seq(MergeUpdateWhen(None, Seq("s" -> lit("fresh")))),
      notMatchedBySource = Seq(
        MergeDeleteWhen(Some(col("id") >= 8)),
        MergeUpdateWhen(None, Seq("s" -> lit("stale")))))
    val out = DeltaRead.read(spark, t).as[(Long, String)].collect().toMap
    assert((0L to 4L).forall(out(_) == "fresh"))
    assert((5L to 7L).forall(out(_) == "stale"))
    assert(out.size == 8, "ids 8,9 deleted by the BY SOURCE delete")
  }

  test("a guarded BY SOURCE clause touches only the files its condition accepts") {
    val t = Staging.tempDir("graft_ma4_")
    DeltaWrite.append(spark.range(40).select($"id",
      ($"id" % 4).cast("string").as("p")), t, Seq("p"))
    val before = DeltaRead.snapshot(spark, t).files
      .filterNot(_.partitionValues.get("p").contains("2")).map(_.path).toSet
    // empty source: every row is "not matched by source"; the condition
    // confines the rewrite to partition p=2
    DeltaWrite.mergeAdvanced(spark, t,
      Seq.empty[Long].toDF("id"), Seq("id"),
      notMatchedBySource = Seq(MergeUpdateWhen(Some(col("p") === "2"),
        Seq("id" -> (col("id") + 1000)))))
    val after = DeltaRead.snapshot(spark, t).files
      .filterNot(_.partitionValues.get("p").contains("2")).map(_.path).toSet
    assert(before == after, "p!=2 partitions must keep their exact bytes")
    val ids = DeltaRead.read(spark, t).select($"id").as[Long].collect().toSet
    assert(ids == (0L until 40L).map(i => if (i % 4 == 2) i + 1000 else i).toSet)
  }

  test("source-only matched conditions prune pass 1 to keys that can fire") {
    val t = Staging.tempDir("graft_ma6_")
    // one file per id-range: ids 0-4 in file A, 5-9 in file B
    DeltaWrite.append(spark.range(0, 5).select($"id", $"id".as("v")), t)
    DeltaWrite.append(spark.range(5, 10).select($"id", $"id".as("v")), t)
    val before = DeltaRead.snapshot(spark, t).files.map(_.path).toSet
    // every id matches, but the SOURCE-ONLY condition fires for ids
    // 5..9 only — file A holds exclusively non-firing keys and must
    // keep its exact bytes (the conservative plan rewrote it)
    val src = spark.range(10).select($"id", ($"id" * 10).as("d"))
    DeltaWrite.mergeAdvanced(spark, t, src, Seq("id"),
      matched = Seq(MergeUpdateWhen(Some(mergeSrc("d") >= 50),
        Seq("v" -> mergeSrc("d")))))
    val after = DeltaRead.snapshot(spark, t).files.map(_.path).toSet
    assert(before.intersect(after).nonEmpty,
      "the all-miss file must keep its path (no rewrite)")
    assert((before -- after).nonEmpty, "the firing file must be rewritten")
    val out = DeltaRead.read(spark, t).as[(Long, Long)].collect().toMap
    assert((0L to 4L).forall(i => out(i) == i), "non-firing rows unchanged")
    assert((5L to 9L).forall(i => out(i) == i * 10), "firing rows updated")
    // a TARGET-referencing condition must NOT prune (it cannot be
    // evaluated on the source alone) — same shape, condition on v
    val t2 = Staging.tempDir("graft_ma6b_")
    DeltaWrite.append(spark.range(0, 5).select($"id", $"id".as("v")), t2)
    DeltaWrite.mergeAdvanced(spark, t2, src, Seq("id"),
      matched = Seq(MergeUpdateWhen(Some(col("v") >= 3),
        Seq("v" -> mergeSrc("d")))))
    val out2 = DeltaRead.read(spark, t2).as[(Long, Long)].collect().toMap
    assert(out2 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 30L, 4L -> 40L))
  }

  test("CDF tables record exact pre/post/delete/insert change rows") {
    val t = Staging.tempDir("graft_ma5_")
    DeltaWrite.append(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"), t)
    DeltaWrite.setProperties(spark, t, Map("delta.enableChangeDataFeed" -> "true"))
    val src = Seq((1L, 5L), (2L, 5L), (7L, 70L)).toDF("id", "d")
    val v = DeltaWrite.mergeAdvanced(spark, t, src, Seq("id"),
      matched = Seq(
        MergeDeleteWhen(Some(col("id") === 2L)),
        MergeUpdateWhen(None, Seq("v" -> (col("v") + mergeSrc("d"))))),
      notMatched = Seq(MergeInsertWhen(None,
        Seq("id" -> col("id"), "v" -> col("d")))))
    // the cdc PARQUET carries the four-type spec surface exactly...
    val raw = spark.read.parquet(t + "/_change_data")
      .select($"id", $"v", col(DeltaRead.ChangeTypeCol).as("ct"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(raw == Set(
      (2L, 20L, "delete"),
      (1L, 10L, "update_preimage"), (1L, 15L, "update_postimage"),
      (7L, 70L, "insert")))
    // ...and the feed folds pre/post onto its two-type delete/insert
    // decomposition (readCdc's documented contract); the untouched
    // kept row (3,30) appears in NEITHER — exact changes, not file diffs
    val feed = DeltaRead.changesBetween(spark, t, v - 1, v)
      .select($"id", $"v", col(DeltaRead.ChangeTypeCol).as("ct"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(feed == Set(
      (2L, 20L, "delete"), (1L, 10L, "delete"),
      (1L, 15L, "insert"), (7L, 70L, "insert")))
  }

  test("duplicate source keys refuse when matched clauses exist; inserts tolerate nothing-to-do") {
    val t = Staging.tempDir("graft_ma6_")
    DeltaWrite.append(Seq((1L, 10L)).toDF("id", "v"), t)
    val dup = Seq((1L, 1L), (1L, 2L)).toDF("id", "d")
    val e = intercept[IllegalArgumentException] {
      DeltaWrite.mergeAdvanced(spark, t, dup, Seq("id"),
        matched = Seq(MergeUpdateWhen(None, Seq("v" -> mergeSrc("d")))))
    }
    assert(e.getMessage.contains("duplicate keys"))
    // BY-SOURCE-only merges read only key PRESENCE, so a duplicate-keyed
    // source is LEGAL (SQL semantics) — the pass-2 join runs against the
    // distinct key set, and the kept matched row must appear exactly once
    DeltaWrite.append(Seq((2L, 20L)).toDF("id", "v"), t)
    DeltaWrite.mergeAdvanced(spark, t, dup, Seq("id"),
      notMatchedBySource = Seq(MergeUpdateWhen(None, Seq("v" -> lit(0L)))))
    val afterBs = DeltaRead.read(spark, t).as[(Long, Long)].collect().toSeq.sorted
    assert(afterBs == Seq((1L, 10L), (2L, 0L)),
      "matched row kept ONCE (no dup multiplication); unmatched row updated")
    // a merge that matches nothing and inserts nothing is a no-op commit-wise
    val v0 = DeltaRead.latestVersion(t)
    val vAfter = DeltaWrite.mergeAdvanced(spark, t,
      Seq((1L, 9L)).toDF("id", "d"), Seq("id"),
      notMatched = Seq(MergeInsertWhen(None, Seq("id" -> col("id")))))
    assert(vAfter == v0, "matched-only source with insert-only clauses: no commit")
  }
}
