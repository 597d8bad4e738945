package graft

import graft.functions.{Natives, TextAnalysis}
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Bit-identity of the native positional n-gram hasher
  * (NgramHashExpr / NativeHelpers.ngramHashes) against the declarative
  * transform/tokenHash60 forms it replaced in q117 / q135 / q150 — the
  * oracle contract is the DECLARATIVE shape, so the native fast path
  * must reproduce it exactly, including tokenization edge cases.
  */
class NgramNativeSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog again and again",
    "  leading and   multi  space\ttab\nnewline tokens here ok yes",
    "short doc",
    "",
    "exactly eight tokens in this very sentence here",
    "a b c d e f g h i j k l m n o p q r s t"
  ).toDF("text")

  private def declarativeSliding(n: Int) = {
    val t = TextAnalysis.tokens($"text")
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => TextAnalysis.tokenHash60(array_join(slice(t, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<bigint>"))
  }

  test("sliding ngramHashes == declarative transform/tokenHash60 (n=1,2,8)") {
    for (n <- Seq(1, 2, 8)) {
      val rows = docs.select(
        Natives.ngramHashes($"text", n, 1).as("native"),
        declarativeSliding(n).as("decl")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n mismatch")
      }
    }
  }

  test("stride-n ngramHashes == tokenHash60 over Curation.chunks") {
    val rows = docs.select(
      Natives.ngramHashes($"text", 10, 10).as("native"),
      transform(Curation.chunks($"text", 10),
        c => TextAnalysis.tokenHash60(c)).as("decl")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("null text -> null; sub-n text -> empty array") {
    val r = Seq[Option[String]](None, Some("one two")).toDF("text")
      .select(Natives.ngramHashes($"text", 8, 1).as("h")).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[Long](0).isEmpty)
  }

  test("SQL registration surface: ngram_hash_native") {
    graft.functions.NativeRegistry.register(spark)
    val n = spark.sql(
      "SELECT size(ngram_hash_native('a b c d', 2, 1)) AS n").collect()(0).getInt(0)
    assert(n == 3)
  }
}
