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
}
