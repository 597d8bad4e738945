package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark spark join"),
    (2L, "spark join window"),
    (3L, "window window window window"),
    (4L, "table scan filter sort")
  ).toDF("doc_id", "text")

  test("termFrequencies/docFrequencies count per-doc and corpus-wide") {
    val tf = Retrieval.termFrequencies(corpus, $"doc_id", $"text")
    val m = tf.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m((1L, "spark")) == 3L && m((2L, "window")) == 1L)
    val df = Retrieval.docFrequencies(tf)
    val d = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d("spark") == 2L && d("window") == 2L && d("table") == 1L)
  }

  test("tfidfTopK ranks term-dense docs first and counts hits") {
    val top = Retrieval
      .tfidfTopK(corpus, $"doc_id", $"text", Seq("spark", "window"), 10)
      .collect()
    // doc 1 (3× spark) must outscore doc 2 (1 spark + 1 window has more
    // hits but lower mass); doc 4 matches nothing and must be absent.
    assert(top.head.getLong(0) == 3L || top.head.getLong(0) == 1L)
    assert(!top.map(_.getLong(0)).contains(4L))
    val hits = top.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits(2L) == 2L)
  }

  test("bm25TopK saturates tf and length-normalizes") {
    val top = Retrieval
      .bm25TopK(corpus, $"doc_id", $"text", Seq("spark"), 10)
      .collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // k1 saturation: 3× tf must score less than 3× the single-hit doc
    val s = top.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) > s(2L) && s(1L) < 3 * s(2L))
  }
}
