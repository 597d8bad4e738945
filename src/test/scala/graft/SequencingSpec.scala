package graft

import graft.operators.Sequencing
import org.apache.spark.sql.functions._

class SequencingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunk: overlapping windows with clamped tail") {
    // 10 tokens, size 4, stride 3 → starts 0,3,6,9 → lens 4,4,4,1
    val doc = Seq((1L, (1 to 10).map("t" + _).mkString(" "))).toDF("id", "text")
    val got = Sequencing.chunk(doc, $"text", size = 4, stride = 3, keep = Seq($"id"))
      .orderBy($"chunk_id").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(got.map(_.getInt(2)).toSeq == Seq(4, 4, 4, 1))
    // overlap: chunk 0 = t1..t4, chunk 1 = t4..t7 (share t4)
    assert(got.map(_.getString(3)).distinct.length == 4)
  }

  test("chunk: doc shorter than one window yields a single clamped chunk") {
    val doc = Seq((1L, "a b")).toDF("id", "text")
    val got = Sequencing.chunk(doc, $"text", size = 64, stride = 48, keep = Seq($"id")).collect()
    assert(got.length == 1 && got.head.getInt(2) == 2)
  }

  test("packAssign: packs advance when the running total crosses the budget") {
    val docs = Seq(
      ("a", 1L, "w w w w"),   // 4 tokens, cum_before 0  → pack 0
      ("a", 2L, "w w w"),     // cum_before 4            → pack 0
      ("a", 3L, "w w"),       // cum_before 7            → pack 1
      ("b", 1L, "w")          // independent partition   → pack 0
    ).toDF("src", "id", "text")
    val got = Sequencing
      .packAssign(docs, $"text", $"src", $"id", budget = 5L, keep = Seq($"src", $"id"))
      .orderBy($"src", $"id").collect()
    assert(got.map(r => (r.getString(0), r.getLong(3))).toSeq ==
      Seq(("a", 0L), ("a", 0L), ("a", 1L), ("b", 0L)))
  }
}
