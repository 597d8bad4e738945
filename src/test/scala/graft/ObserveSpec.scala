package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** `Dataset.observe`: in-flight data-quality metrics collected DURING
  * a query (one pass, no second scan) and surfaced through a
  * QueryExecutionListener — the engine hook a production pipeline uses
  * to account rows/nulls/volume while the real work runs. The spec
  * pins the observed values against directly-computed aggregates.
  */
class ObserveSpec extends SparkTestBase {
  import spark.implicits._

  test("observe() metrics match direct aggregates, collected in one pass") {
    @volatile var observed: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, duration: Long): Unit = {
        qe.observedMetrics.get("silver_metrics").foreach(r => observed = Some(r))
      }
      override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val ev = Tables.events(spark, sf)
      val pipeline = ev
        .observe("silver_metrics",
          count(lit(1)).as("n_rows"),
          count(when($"value".isNull, 1)).as("n_null_value"),
          sum(length($"props")).as("props_bytes"))
        .filter($"event_type" =!= "error")
        .groupBy($"event_type").agg(count(lit(1)).as("n"))
      val result = pipeline.collect()
      assert(result.nonEmpty)
      // listener delivery is async; poll briefly instead of touching
      // the private listenerBus
      val deadline = System.currentTimeMillis() + 10000
      while (observed.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(observed.isDefined, "listener never saw the observed metrics")
      val m = observed.get
      val direct = ev.agg(count(lit(1)), count(when($"value".isNull, 1)),
        sum(length($"props"))).collect()(0)
      assert(m.getAs[Long]("n_rows") == direct.getLong(0))
      assert(m.getAs[Long]("n_null_value") == direct.getLong(1))
      assert(m.getAs[Long]("props_bytes") == direct.getLong(2))
    } finally spark.listenerManager.unregister(listener)
  }
}
