package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** The one `private[sql]` bridge graft needs: Spark's V1 streaming
  * `Source.getBatch` contract requires the returned DataFrame to carry
  * `isStreaming = true` (MicroBatchExecution asserts it), but the only
  * way to stamp an arbitrary batch plan as streaming is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming =
  * true)` — package-private to `org.apache.spark.sql`. Every V1 file
  * source in the ecosystem (Spark's own FileStreamSource, the
  * reference Delta implementation's DeltaSource) lives inside that
  * package for exactly this call; this shim re-exports just the one
  * method so the graft source can stay in its own package.
  *
  * The plan is materialized through `queryExecution.toRdd`, so the full
  * batch read path (scans, filters, the change-feed union) executes
  * unchanged — only the streaming flag on the wrapping plan node
  * differs. */
object StreamingFrames {
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
