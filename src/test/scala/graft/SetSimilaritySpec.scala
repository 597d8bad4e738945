package graft

import graft.functions.TextAnalysis
import graft.operators.SetSimilarity
import org.apache.spark.sql.functions._

/** The adaptive exact set-similarity join: the dense (bitmask) and
  * Zipfian (prefix-join) strategies must emit IDENTICAL band
  * accounting — same pair counts, same distinct-left-doc counts, same
  * jaccard values — and the dispatcher must route by vocabulary. */
class SetSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def bands(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("dense bitmask strategy == prefix-join strategy on the documents corpus") {
    val toks = Tables.documents(spark, sf)
      .select($"doc_id", array_distinct(TextAnalysis.tokens($"text")).as("t"))
      .where(size($"t") > 0)
    val dense = bands(SetSimilarity.denseBandsForTest(toks, 0.6))
    val prefix = bands(SetSimilarity.prefixBandsForTest(toks, 0.6))
    assert(dense.nonEmpty, "fixture must produce qualifying pairs")
    assert(dense == prefix)
  }

  test("strategies agree on a hand-built corpus with duplicates, chains and isolates") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d e"), // exact triple
      (4L, "a b c d f"), (5L, "a b c g h"),                    // near + far
      (6L, "x y z"), (7L, "x y w"), (8L, "q r s t u v")        // island + isolate
    ).toDF("doc_id", "text")
    val toks = docs.select($"doc_id",
        array_distinct(TextAnalysis.tokens($"text")).as("t"))
      .where(size($"t") > 0)
    for (tau <- Seq(0.4, 0.6, 0.8)) {
      val dense = bands(SetSimilarity.denseBandsForTest(toks, tau))
      val prefix = bands(SetSimilarity.prefixBandsForTest(toks, tau))
      assert(dense == prefix, s"strategy divergence at tau=$tau")
    }
    // sanity on known pairs at tau=0.6: the exact triple gives 3 pairs
    // at jac 1.0; (1,4),(2,4),(3,4) at 4/6; (6,7) at 2/4 misses
    val got = bands(SetSimilarity.denseBandsForTest(toks, 0.6))
      .map { case (b, n, _, _) => b -> n }.toMap
    assert(got(1.0) == 3L)
    assert(got(0.6) == 3L)
  }

  test("strategies agree on randomized corpora across vocab sizes and taus (property)") {
    // deterministic pseudo-random corpora spanning the dense (≤62) and
    // prefix (>62) regimes, including the boundary — the two paths
    // share NO code beyond the band formula, so agreement on arbitrary
    // set families is the strongest exactness evidence available
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 6) {
      val vocab = Seq(5, 20, 62, 63, 70, 11)(trial)
      val nDocs = 12 + rnd.nextInt(18)
      val docs = (1 to nDocs).map { i =>
        val sz = 1 + rnd.nextInt(math.min(vocab, 8))
        val toks = Seq.fill(sz)(s"v${rnd.nextInt(vocab)}").distinct
        (i.toLong, toks.mkString(" "))
      }.toDF("doc_id", "text")
      val toks = docs.select($"doc_id",
          array_distinct(TextAnalysis.tokens($"text")).as("t"))
        .where(size($"t") > 0)
      for (tau <- Seq(0.3, 0.5, 0.7)) {
        val dense = bands(SetSimilarity.denseBandsForTest(toks, tau))
        val prefix = bands(SetSimilarity.prefixBandsForTest(toks, tau))
        assert(dense == prefix,
          s"strategy divergence: trial=$trial vocab=$vocab tau=$tau")
      }
    }
  }

  test("dispatcher: tiny vocab routes dense; >62-token vocab routes prefix (still exact)") {
    // 100 distinct tokens => masks cannot fit a long; the dispatcher
    // must pick the prefix join and the result must still be exact
    val wide = (1 to 20).map { i =>
      (i.toLong, (0 until 10).map(j => s"tok${(i * 7 + j) % 100}").distinct.mkString(" "))
    }.toDF("doc_id", "text")
    val toks = wide.select($"doc_id",
        array_distinct(TextAnalysis.tokens($"text")).as("t"))
      .where(size($"t") > 0)
    val auto = bands(SetSimilarity.jaccardBands(toks, 0.5))
    val prefix = bands(SetSimilarity.prefixBandsForTest(toks, 0.5))
    assert(auto == prefix)
  }

  test("guard: tiny vocab but many distinct sets routes prefix (no O(S²) broadcast)") {
    // vocab of 10 tokens (masks fit a long) but 60 distinct subsets:
    // vocabulary size does NOT bound the set count (2^vocab masks are
    // possible), so the dispatcher must also gate on distinct sets
    val vocabToks = (0 until 10).map(i => s"t$i")
    // set for doc i = tokens at the set bits of i+1: 60 provably
    // distinct nonempty subsets of a 10-token vocabulary
    val many = (0 until 60).map { i =>
      (i.toLong, (0 until 10).filter(j => (((i + 1) >> j) & 1) == 1).map(vocabToks))
    }.toDF("doc_id", "t")
    assert(SetSimilarity.chosenStrategy(many, maxDenseSets = 10L) == "prefix")
    assert(SetSimilarity.chosenStrategy(many) == "dense",
      "default cap admits this corpus — only the guard rejects it")
    // guarded routing must not change the answer
    val guarded = bands(SetSimilarity.jaccardBands(many, 0.5, maxDenseSets = 10L))
    val dense = bands(SetSimilarity.denseBandsForTest(many, 0.5))
    assert(guarded == dense)
  }

  test("tokens containing the space character do not collide distinct sets") {
    // regression: an md5(array_join(t, \" \")) fingerprint merged
    // [\"a b\",\"c\"] with [\"a\",\"b c\"] — distinct sets with zero
    // overlap — into one, emitting a phantom jac-1.0 within-set pair.
    // Keying on the vocabulary bitmask makes collision impossible.
    val toks = Seq(
      (1L, Seq("a b", "c")),
      (2L, Seq("a", "b c"))
    ).toDF("doc_id", "t")
    assert(SetSimilarity.denseBandsForTest(toks, 0.5).count() == 0,
      "disjoint sets must produce no qualifying pairs")
    assert(bands(SetSimilarity.denseBandsForTest(toks, 0.5)) ==
      bands(SetSimilarity.prefixBandsForTest(toks, 0.5)))
  }
}
