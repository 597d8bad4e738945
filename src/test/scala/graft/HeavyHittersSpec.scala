package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries heavy-hitters aggregate: exactness below capacity, the
  * MG error bound under eviction, merge-tree invariance, and the SQL
  * registration path. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local()
  import spark.implicits._

  test("exact when k >= distinct: matches groupBy count on documents") {
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"source", explode(graft.functions.TextAnalysis.tokens($"text")).as("w"))
    val mg = toks.groupBy($"source")
      .agg(HeavyHitters.misraGries($"w", 4096).as("hh"))
      .select($"source", explode($"hh").as("e"))
      .select($"source", $"e.item".as("item"), $"e.est".as("est"))
    val exact = toks.groupBy($"source", $"w").agg(count(lit(1)).as("n"))
      .select($"source", $"w".as("item"), $"n".as("est"))
    assert(mg.count() == exact.count())
    assert(mg.except(exact).isEmpty && exact.except(mg).isEmpty)
  }

  test("MG bound under eviction: est <= true, true - est <= n/(k+1), no missed hitter") {
    // adversarial skew: a=600, b=300, c=100, then 200 singletons
    val items = Seq.fill(600)("a") ++ Seq.fill(300)("b") ++ Seq.fill(100)("c") ++
      (1 to 200).map(i => s"x$i")
    val n = items.size
    val k = 4
    val truth = items.groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val est = items.toDF("w").repartition(13)
      .agg(HeavyHitters.misraGries($"w", k).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().toMap
    assert(est.size <= k)
    est.foreach { case (item, e) =>
      val t = truth(item)
      assert(e <= t, s"$item overestimated: $e > $t")
      assert(t - e <= n.toLong / (k + 1), s"$item error ${t - e} > ${n / (k + 1)}")
    }
    truth.filter(_._2 > n.toLong / (k + 1)).keys.foreach { hitter =>
      assert(est.contains(hitter), s"heavy hitter $hitter missing from summary")
    }
  }

  test("merge-tree invariance: 1-partition and 17-partition runs agree (k over capacity)") {
    val df = (1 to 2000).map(i => s"v${i % 37}").toDF("w")
    def run(parts: Int) = df.repartition(parts)
      .agg(HeavyHitters.misraGries($"w", 64).as("hh"))
      .select(explode($"hh").as("e")).select($"e.item", $"e.est")
      .as[(String, Long)].collect().toSet
    assert(run(1) == run(17))
  }

  test("SQL registration: misra_gries(w, k) in query text") {
    graft.functions.NativeRegistry.register(spark)
    val rows = (1 to 50).map(i => s"t${i % 3}").toDF("w").createOrReplaceTempView("mg_in")
    val out = spark.sql(
      "SELECT hh.item, hh.est FROM (SELECT explode(misra_gries(w, 16)) AS hh FROM mg_in)")
      .as[(String, Long)].collect().toMap
    assert(out == Map("t0" -> 16L, "t1" -> 17L, "t2" -> 17L))
  }
}
