package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Unit coverage for the corpus-curation Column builders (q117–q123
  * exercise them end-to-end against the oracle; these pin the
  * per-function edge cases). */
class CurationSpec extends SparkTestBase {

  import spark.implicits._

  test("chunks emits only full-width chunks, in order") {
    val out = Seq("a b c d e f g", "a b", "").toDF("text")
      .select(Curation.chunks($"text", 3).as("ch"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "d e f")) // trailing "g" dropped
    assert(out(1) == Seq.empty)             // shorter than width
    assert(out(2) == Seq.empty)             // empty text
  }

  test("chunks handles multi-space and leading whitespace like tokens()") {
    val out = Seq("  x  y   z w").toDF("text")
      .select(Curation.chunks($"text", 2).as("ch"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("x y", "z w"))
  }

  test("countMatches counts non-overlapping PII hits") {
    val df = Seq(
      "mail a@b.co and c@d.org plus 10.0.0.7 call 555-0142",
      "no pii here").toDF("t")
    val r = df.select(
      Curation.countMatches($"t", Curation.EmailRe).as("e"),
      Curation.countMatches($"t", Curation.Ipv4Re).as("i"),
      Curation.countMatches($"t", Curation.PhoneRe).as("p")).collect()
    assert((r(0).getInt(0), r(0).getInt(1), r(0).getInt(2)) == ((2, 1, 1)))
    assert((r(1).getInt(0), r(1).getInt(1), r(1).getInt(2)) == ((0, 0, 0)))
  }

  test("redactPii replaces all classes and leaves clean text alone") {
    val r = Seq("write a@b.co from 10.0.0.7 or call 555-0142 ok")
      .toDF("t").select(Curation.redactPii($"t")).collect()(0).getString(0)
    assert(r == "write <EMAIL> from <IP> or call <PHONE> ok")
    val clean = Seq("nothing to redact").toDF("t")
      .select(Curation.redactPii($"t")).collect()(0).getString(0)
    assert(clean == "nothing to redact")
  }

  test("email redaction wins over IP inside an address") {
    // digits-and-dots local/domain parts must not leak as <IP>
    val r = Seq("u.1.2.3@h10.0.0.7.example.com end").toDF("t")
      .select(Curation.redactPii($"t")).collect()(0).getString(0)
    assert(r == "<EMAIL> end")
  }

  test("domain extracts first URL host, empty when absent") {
    val r = Seq(
      "see https://news.example.com/a?x=1 then http://other.org/b",
      "plain text").toDF("t")
      .select(Curation.domain($"t")).collect().map(_.getString(0))
    assert(r(0) == "news.example.com")
    assert(r(1) == "")
  }

  test("q190 kappa: bounded, zero exactly when agreement is at chance") {
    val rows = graft.queries.CurationQueries.q190ClassifierKappa.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (po, pe, k) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(po >= 0.0 && po <= 1.0 && pe >= 0.0 && pe <= 1.0)
      assert(k >= -1.0 && k <= 1.0, s"kappa $k out of range")
      if (math.abs(po - pe) < 1e-9) assert(math.abs(k) < 1e-6)
    }
  }

  test("q187 calibration: bins bounded, conf within bin, ECE is the n-weighted gap") {
    val rows = graft.queries.CurationQueries.q187Calibration.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val ece = rows.head.getDouble(5)
    rows.foreach { r =>
      val (bin, n, conf, rate, gap) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(bin >= 0 && bin <= 9)
      assert(conf >= bin / 10.0 - 1e-6 && (bin == 9 || conf < (bin + 1) / 10.0 + 1e-6),
        s"avg_conf $conf outside bin $bin")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(gap - math.abs(conf - rate)) < 1e-6)
      assert(r.getDouble(5) == ece, "ECE must be identical on every row")
    }
    val n = rows.map(_.getLong(1)).sum
    val expected = rows.map(r => r.getLong(1) * r.getDouble(4)).sum / n
    assert(math.abs(ece - expected) < 1e-6, s"ECE $ece != weighted gap $expected")
  }

  test("q188 padding waste: caps cover lengths, totals reconcile, naive >= bucketed") {
    import graft.functions.TextAnalysis
    val rows = graft.queries.CurationQueries.q188PaddingWaste.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val naive = rows.head.getDouble(6)
    rows.foreach { r =>
      val (bucket, cap, n, sum, padded, waste) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(cap == (bucket + 1) * 64)
      assert(padded == n * cap)
      assert(sum <= padded, "bucket cap must cover every member's length")
      assert(sum > (cap - 64) * n - n, "members must belong in this bucket")
      assert(waste >= 0.0 && waste < 100.0)
    }
    // every token accounted for exactly once across buckets
    val totalTokens = Tables.documents(spark, sf)
      .select(size(TextAnalysis.tokens($"text")).cast("long").as("n"))
      .agg(sum($"n")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(3)).sum == totalTokens)
    // padding to the global max cannot beat bucket-local caps
    val bucketedWaste = {
      val padded = rows.map(_.getLong(4)).sum.toDouble
      (padded - totalTokens) / padded * 100
    }
    assert(naive >= bucketedWaste - 1e-9,
      s"naive $naive should be >= bucketed $bucketedWaste")
  }

  test("wordNgrams native == declarative twin on real documents") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").limit(300)
    Seq(2, 3).foreach { n =>
      val diff = docs.select(
        Curation.wordNgrams($"text", n).as("a"),
        Curation.wordNgramsDeclarative($"text", n).as("b"))
        .where(!($"a" <=> $"b")).count()
      assert(diff == 0, s"native $n-grams must be bit-identical")
    }
    // edge shapes: empty, whitespace-only, exactly n tokens, null
    val edge = Seq("", "   ", "a b", "a  b   c", null).toDF("text")
    val diff = edge.select(
      Curation.wordNgrams($"text", 2).as("a"),
      Curation.wordNgramsDeclarative($"text", 2).as("b"))
      .where(!($"a" <=> $"b")).count()
    assert(diff == 0)
  }

  test("repetitionSignals: Gopher fractions, short-doc zeros, tie-break") {
    val docs = Seq(
      (1L, "spam spam spam spam"),        // one 2-gram "spam spam" x3
      (2L, "all distinct words here now"),
      (3L, "x"),                          // too short for any 2-gram
      (4L, "")                            // empty
    ).toDF("doc_id", "text")
    val sig = Curation.repetitionSignals(docs, "doc_id", $"text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // doc 1: top 2-gram "spam spam" (9 chars) occurs 3x over len 19
    assert(math.abs(sig(1L)._1 - 3.0 * 9 / 19) < 1e-12)
    // doc 1: 3-gram "spam spam spam" (14 chars) occurs 2x over len 19
    assert(math.abs(sig(1L)._2 - 2.0 * 14 / 19) < 1e-12)
    // doc 2: every 2-gram unique -> top covers exactly one occurrence
    assert(sig(2L)._1 > 0.0 && sig(2L)._2 == 0.0)
    // short/empty docs: defined, zero
    assert(sig(3L) == ((0.0, 0.0)) && sig(4L) == ((0.0, 0.0)))
  }
}
