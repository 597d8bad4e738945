package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Contract of the q154 ANN evaluation harness: recall@k against
  * brute-force ground truth is monotone non-decreasing in nprobe and
  * exactly 1.0 when every cell is probed (full probe ≡ brute force,
  * because both share the (sim desc, cid asc) tie-break).
  */
class AnnRecallSpec extends SparkTestBase {
  import spark.implicits._

  test("IVF recall@10 monotone in nprobe, 1.0 at full probe") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" % 97 === 0)
    val truth = Similarity.bruteForceTopK(queries, emb, 10).select($"qid", $"cid")
    val nTruth = truth.count().toDouble
    val centroids = Similarity.buildCentroids(emb, "label")
    val recalls = Seq(1, 2, 1000).map { np =>
      val got = Similarity.ivfTopK(queries, emb, centroids, k = 10, nprobe = np)
        .select($"qid", $"cid")
      got.join(truth, Seq("qid", "cid"), "left_semi").count() / nTruth
    }
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(recalls.last == 1.0, s"full-probe recall != 1.0: ${recalls.last}")
    assert(recalls.head > 0.0, "nprobe=1 recall should catch same-cell neighbors")
  }
}
