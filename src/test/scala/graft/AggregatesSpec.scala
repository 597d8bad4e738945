package graft

import graft.functions.Aggregates
import org.apache.spark.sql.functions._

/** Welford/Chan variance Aggregator: equals Spark's var_samp to 1e-9
  * relative under real partial-merge parallelism, survives nulls and
  * n<2 groups, and registers for SQL text.
  */
class AggregatesSpec extends SparkTestBase {
  import spark.implicits._

  test("welfordVar == var_samp on events (32-partition merge tree)") {
    val rows = Tables.events(spark, sf)
      .repartition(32)
      .groupBy($"event_type")
      .agg(Aggregates.welfordVar($"value").as("w"), var_samp($"value").as("v"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, v) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(w - v) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"${r.getString(0)}: welford=$w var_samp=$v")
    }
  }

  test("nulls ignored; n<2 yields null (matches var_samp)") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(5.0)), ("b", None),
      ("c", None)).toDF("k", "x")
    val rows = df.groupBy($"k")
      .agg(Aggregates.welfordVar($"x").as("w"), var_samp($"x").as("v"))
      .orderBy($"k").collect()
    assert(rows(0).getDouble(1) == 2.0 && rows(0).getDouble(2) == 2.0)
    assert(rows(1).isNullAt(1) == rows(1).isNullAt(2))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("catastrophic-cancellation regime: huge mean, tiny variance") {
    // naive E[x^2]-E[x]^2 loses all precision here; Welford must not
    val base = 1e12
    val df = (0 until 1000).map(i => base + (i % 2)).toDF("x").repartition(8)
    val w = df.agg(Aggregates.welfordVar($"x")).collect()(0).getDouble(0)
    val expected = 1000.0 / 999.0 * 0.25 // var of fair 0/1 coin, sample-corrected
    // Welford is ulp-limited: deltas carry ulp(1e12) ≈ 1.2e-4 each, so
    // ~1e-5 absolute slack on the result. The naive E[x²]−E[x]² form
    // fails this test by EVERYTHING (ulp(1e24) ≈ 1e8 ≫ the variance).
    assert(math.abs(w - expected) < 1e-4, s"welford=$w expected=$expected")
  }

  test("SQL registration: welford_var in query text") {
    Aggregates.register(spark)
    Tables.events(spark, sf).createOrReplaceTempView("agg_events")
    val r = spark.sql(
      """SELECT abs(welford_var(value) - var_samp(value)) AS d
        |FROM agg_events""".stripMargin).collect()(0).getDouble(0)
    assert(r < 1e-6)
  }
}
