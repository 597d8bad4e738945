package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("bloomPrune keeps every joining row (no false negatives)") {
    val fact = (1L to 1000L).map(i => (i, i % 50)).toDF("id", "k")
    val dim = Seq(1L, 7L, 13L).toDF("dk")
    val pruned = Joins.bloomPrune(fact, $"k", dim, $"dk", numItems = 100L)
    val joined = pruned.join(dim, $"k" === $"dk").count()
    val expected = fact.join(dim, $"k" === $"dk").count()
    assert(joined == expected && expected == 60L)
    // the prune itself must be a superset of the true matches and a
    // subset of the fact
    val n = pruned.count()
    assert(n >= 60L && n <= 1000L)
  }

  test("bloomPrune with empty dim prunes everything") {
    val fact = Seq(1L, 2L).toDF("k")
    val dim = Seq.empty[Long].toDF("dk")
    assert(Joins.bloomPrune(fact, $"k", dim, $"dk").count() == 0L)
  }
}
