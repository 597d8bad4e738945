package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof backward: latest at-or-before wins; no prior -> null; exact tie visible") {
    val left = Seq(
      (1L, ts("2021-01-01 10:00:00"), "a"),
      (1L, ts("2021-01-01 12:00:00"), "b"),
      (2L, ts("2021-01-01 11:00:00"), "c"),
      (3L, ts("2021-01-01 08:00:00"), "d"), // no checkpoint at all for key 3
      (2L, ts("2021-01-01 09:00:00"), "e")  // before key 2's first checkpoint
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2021-01-01 09:00:00"), 0.5),
      (1L, ts("2021-01-01 12:00:00"), 0.9), // exact tie with left 'b'
      (2L, ts("2021-01-01 09:30:00"), 0.2)
    ).toDF("k", "rt", "score")
    val got = Temporal.asofJoinBackward(left, right, "k", "t", "rt", Seq("score"))
      .collect().map(r => r.getString(2) -> (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got == Map("a" -> 0.5, "b" -> 0.9, "c" -> 0.2, "d" -> null, "e" -> null))
  }

  test("asof backward: a matched row's NULL attribute is carried as NULL, never a staler value; no row tearing") {
    val left = Seq((1L, ts("2021-01-01 11:00:00"), "x")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2021-01-01 09:00:00"), Option(0.5), Option("old")),
      (1L, ts("2021-01-01 10:00:00"), Option.empty[Double], Option("new"))
    ).toDF("k", "rt", "score", "label")
    val r = Temporal.asofJoinBackward(left, right, "k", "t", "rt", Seq("score", "label"))
      .collect()(0)
    // the 10:00 row is the as-of match: its NULL score must NOT be
    // backfilled from 09:00, and label must come from the SAME row
    assert(r.isNullAt(3), s"score leaked from a staler row: $r")
    assert(r.getString(4) == "new", s"row tearing: $r")
  }

  test("binned range join == naive between join, incl. overlapping ranges") {
    val ev = Tables.events(spark, sf).select($"event_id", $"ts", $"value").limit(2000)
    val anchor = ev.agg(min(date_trunc("day", $"ts"))).collect()(0).getTimestamp(0)
    val ranges = spark.range(0, 10).select($"id".as("range_id"),
      expr(s"timestamp'$anchor' + make_interval(0, 0, 0, CAST(id * 2 AS INT), 0, 0, 0)").as("s"))
      .withColumn("e", expr("s + make_interval(0, 0, 0, 3, 0, 0, 0)"))
    val binned = Temporal.rangeJoinBinned(ev, ranges, "ts", "s", "e", 86400L)
      .select($"event_id", $"range_id")
    val naive = ev.crossJoin(ranges).filter($"ts" >= $"s" && $"ts" <= $"e")
      .select($"event_id", $"range_id")
    assert(binned.exceptAll(naive).count() == 0 && naive.exceptAll(binned).count() == 0)
    assert(naive.count() > 0, "fixture must produce matches")
    // overlap sanity: some events match more than one range (stride 2 < len 3)
    assert(binned.groupBy($"event_id").count().filter($"count" > 1).count() > 0)
  }

  test("scd2 collapses runs into versioned intervals with one open row per key") {
    val ev = Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L), (2L, "X", 10L, 5L)
    ).toDF("k", "st", "t", "id")
      .withColumn("t", timestamp_seconds($"t"))
    val got = Temporal.scd2(ev, "k", "st", "t", "id")
      .orderBy($"k", $"version")
      .select($"k", $"st", unix_timestamp($"valid_from"),
        unix_timestamp($"valid_to"), $"version", $"is_current")
      .collect()
    // key 1: A[10,30) v1, B[30,40) v2, A[40,∞) v3 — the repeat at t=20
    // collapses into v1; the return to A at t=40 is a NEW version.
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4), r.getBoolean(5))).toSeq ==
      Seq((1L, "A", 10L, 30L, 1, false), (1L, "B", 30L, 40L, 2, false),
        (1L, "A", 40L, -1L, 3, true), (2L, "X", 10L, -1L, 1, true)))
  }

  test("scd2 collapses runs of NULL attributes like any other run") {
    val ev = Seq(
      (1L, Option("A"), 10L, 1L), (1L, None, 20L, 2L), (1L, None, 30L, 3L),
      (1L, Option("B"), 40L, 4L), (2L, Option.empty[String], 10L, 5L)
    ).toDF("k", "st", "t", "id")
      .withColumn("t", timestamp_seconds($"t"))
    val got = Temporal.scd2(ev, "k", "st", "t", "id")
      .orderBy($"k", $"version")
      .select($"k", $"st", $"version").collect()
    // the two consecutive NULLs are ONE version; a leading NULL (key 2)
    // still yields its first row
    assert(got.map(r => (r.getLong(0),
      if (r.isNullAt(1)) "∅" else r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "A", 1), (1L, "∅", 2), (1L, "B", 3), (2L, "∅", 1)))
  }
}
