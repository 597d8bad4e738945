package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The persisted cell-partitioned IVF index: ranking from the index
  * must be row-identical to the in-memory ivfTopK at every nprobe,
  * and the probed-cells predicate must land as a PARTITION filter —
  * the directory-level pruning that makes "a probe touches 1/cells of
  * the corpus" literally true on disk. */
class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("index rank == in-memory ivfTopK at partial and full nprobe; scan prunes cells") {
    val emb = Tables.embeddings(spark, sf)
    val centroids = Similarity.buildCentroids(emb, "label")
    val queries = emb.filter($"vec_id" < 5)
    val idx = java.nio.file.Files.createTempDirectory("ivfidx").toString
    try {
      Similarity.ivfWriteIndex(emb, centroids, idx)
      for (nprobe <- Seq(2, 1000)) {
        val fromIndex = Similarity.ivfTopKFromIndex(idx, queries, centroids, 5, nprobe)
        val inMemory = Similarity.ivfTopK(queries, emb, centroids, 5, nprobe)
        assert(triples(fromIndex) == triples(inMemory), s"divergence at nprobe=$nprobe")
      }
      // the nprobe=2 read must carry cell_id in PartitionFilters (whole
      // unprobed directories eliminated before listing), and with 5
      // queries x 2 probes the probed-cell set must be < all cells
      val probed = Similarity.ivfTopKFromIndex(idx, queries, centroids, 5, 2)
      probed.collect()
      // AQE wraps the final plan in AdaptiveSparkPlanExec / QueryStageExec
      // nodes that children-based collect() does not see through
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(allScans)
      }
      val scans = allScans(probed.queryExecution.executedPlan)
      val pf = scans.map(_.partitionFilters.map(_.sql).mkString(" && "))
        .find(_.contains("cell_id"))
      assert(pf.isDefined,
        s"cell_id not in any scan's partitionFilters: ${scans.map(_.partitionFilters)}")
      val nCells = centroids.count()
      val touched = scans.find(_.partitionFilters.nonEmpty).get
        .selectedPartitions.partitionCount
      assert(touched < nCells,
        s"probe touched all $nCells cells — pruning did not happen")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    }
  }
}
