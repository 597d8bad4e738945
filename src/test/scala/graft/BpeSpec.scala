package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE apply semantics ([[Bpe.applyMerges]]): classic batch rule —
  * lowest applicable rank wins, ALL its non-overlapping occurrences
  * fuse left to right before re-selection — pinned against the edge
  * cases where naive one-at-a-time fusion diverges. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def enc(w: String, merges: Seq[(String, String)]): Seq[String] =
    Bpe.applyMerges(w, merges.toIndexedSeq, merges.zipWithIndex.toMap)

  test("classic apply: rank order, batch fusion, repeated re-selection") {
    val m = Bpe.EnglishMerges
    assert(enc("the", m) == Seq("the"), "t+h -> th, th+e -> the")
    assert(enc("thinking", m) == Seq("th", "in", "k", "ing"))
    assert(enc("stand", m) == Seq("st", "and"),
      "a+n -> an, an+d -> and, then s+t -> st")
    assert(enc("x", m) == Seq("x"))
    assert(enc("", m) == Seq())
    assert(enc("zzz", m) == Seq("z", "z", "z"), "no merge applies")
  }

  test("batch fusion is NOT one-at-a-time: a created lower-rank pair cannot preempt") {
    // rank0 = (ab, a), rank1 = (a, b). On "abab" the only applicable
    // merge is rank1; fusing ALL occurrences gives [ab, ab] and (ab, a)
    // never appears. One-at-a-time fusion would create (ab, a) after
    // the first occurrence and end at [aba, b] — the divergence the
    // batch rule (and the q244 oracle's replace()) avoids.
    val m = Seq(("ab", "a"), ("a", "b"))
    assert(enc("abab", m) == Seq("ab", "ab"))
    // overlapping occurrences fuse greedily left to right: aaa -> [aa, a]
    val m2 = Seq(("a", "a"))
    assert(enc("aaa", m2) == Seq("aa", "a"))
    assert(enc("aaaa", m2) == Seq("aa", "aa"))
    // a fusion can enable a later-rank merge across the new boundary
    val m3 = Seq(("a", "b"), ("ab", "c"))
    assert(enc("abc", m3) == Seq("abc"))
  }

  test("encodeWords: distributed encode over the word table matches the local rule") {
    val words = Seq(("the", 10L), ("thinking", 3L), ("stand", 2L), ("aaa", 1L))
      .toDF("w", "wc")
    val got = Bpe.encodeWords(words, "w", Bpe.EnglishMerges)
      .select($"w", $"bpe").as[(String, Seq[String])].collect().toMap
    assert(got("the") == Seq("the") && got("thinking") == Seq("th", "in", "k", "ing"))
    assert(got("stand") == Seq("st", "and") && got("aaa") == Seq("a", "a", "a"))
    // corpus-weighted token accounting: the q244 shape
    val counts = Bpe.encodeWords(words, "w", Bpe.EnglishMerges)
      .select($"wc", explode($"bpe").as("tok"))
      .groupBy($"tok").agg(sum($"wc").as("n"))
      .as[(String, Long)].collect().toMap
    assert(counts("the") == 10L && counts("a") == 3L && counts("ing") == 3L)
  }
}
