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

  test("PQ trained (k-means) codebooks: recall >= planted label-mean codebooks") {
    // float nondeterminism in the k-means component means blocks a hash
    // oracle for the trained variant (the q154 convention), so quality
    // is pinned here instead: Lloyd's iterations minimize exactly the
    // L2 distortion pqEncode assigns with, so the trained books must
    // rank at least as well as the label-mean ones against brute-force
    // ground truth on the same corpus.
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 10)
    val truth = Similarity.bruteForceTopK(queries, emb, 10).select($"qid", $"cid")
    val nTruth = truth.count().toDouble
    def recall(cb: org.apache.spark.sql.DataFrame): Double = {
      val codes = Similarity.pqEncode(emb, cb, m = 8, dim = 64)
      Similarity.pqTopK(queries, codes, cb, k = 10, m = 8, dim = 64, codesPerSub = 10)
        .select($"qid", $"cid")
        .join(truth, Seq("qid", "cid"), "left_semi").count() / nTruth
    }
    val planted = recall(Similarity.pqCodebooks(emb, "label", m = 8, dim = 64))
    val trained = recall(Similarity.pqCodebooksTrained(
      emb, m = 8, dim = 64, codesPerSub = 10, iters = 4))
    assert(trained >= planted,
      s"trained recall $trained regressed below planted $planted")
    assert(trained > 0.0, "trained PQ must recover some true neighbors")
  }
}
