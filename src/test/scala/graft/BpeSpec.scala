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

  test("learnMerges: hand-computed course on a toy vocabulary") {
    // vocab: low*5, lower*2, newest*6, widest*3
    // round 1 pairs: (l,o)=7, (o,w)=7, (w,e)=8(2 lower + 3 widest... )
    // — let the assertions carry the exact arithmetic:
    //   es: newest 6 + widest 3 = 9  <- argmax round 1
    //   st: 6 + 3 = 9 ties es; tie-break pair asc: (e,s) < (s,t)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "wc")
    val learned = Bpe.learnMerges(words, "w", "wc", 3)
    assert(learned(0).l == "e" && learned(0).r == "s" && learned(0).pairCount == 9L,
      s"round 1 must fuse (e,s) on count 9 (tie with st broken lexicographically): $learned")
    // tokens before: low 3*5 + lower 5*2 + newest 6*6 + widest 6*3 = 79
    // round 1 fuses one es per newest/widest occurrence: 79 - 9 = 70
    assert(learned(0).tokensAfter == 70L, s"got $learned")
    // round 2: (es,t): 6+3=9 wins (l,o)/(o,w)=7
    assert(learned(1).l == "es" && learned(1).r == "t" && learned(1).pairCount == 9L)
    assert(learned(1).tokensAfter == 61L)
    // round 3: (l,o)=7 and (o,w)=7 tie; (l,o) < (o,w)
    assert(learned(2).l == "l" && learned(2).r == "o" && learned(2).pairCount == 7L)
    assert(learned(2).tokensAfter == 54L)
  }

  test("learnMerges overlapping-pair accounting: counts are pair counts, fusions are fewer") {
    // "aaaa"*1: round-1 pair (a,a) counts 3 ADJACENCIES but fuses only
    // 2 non-overlapping occurrences -> tokensAfter = 4 - 2 = 2, not 1
    val words = Seq(("aaaa", 1L)).toDF("w", "wc")
    val learned = Bpe.learnMerges(words, "w", "wc", 1)
    assert(learned(0).l == "a" && learned(0).r == "a" && learned(0).pairCount == 3L)
    assert(learned(0).tokensAfter == 2L,
      s"batch fusion is greedy non-overlapping: $learned")
  }

  test("train->encode closure: encodeWords under learned merges replays the training tokenization") {
    // rank-greedy encoding reproduces training's tokenization on the
    // training vocabulary (the classic BPE invariant q248 pins
    // corpus-scale): verify on a vocab where merges chain and tie
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("lowest", 4L), ("aaaa", 2L)).toDF("w", "wc")
    val learned = Bpe.learnMerges(words, "w", "wc", 6)
    // training tokenization: re-apply the course one merge at a time
    var cur = words.select($"w", split($"w", "").as("toks"))
    learned.foreach(m =>
      cur = cur.withColumn("toks", Bpe.applyOneMerge($"toks", m.l, m.r)))
    val trained = cur.as[(String, Seq[String])].collect().toMap
    val encoded = Bpe.encodeWords(words, "w", learned.map(m => (m.l, m.r)))
      .select($"w", $"bpe").as[(String, Seq[String])].collect().toMap
    assert(encoded == trained,
      s"encode must replay training:\n  enc $encoded\n  trn $trained")
  }
}
