package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

/** BPE ENCODE — apply a learned merge list to tokenize for real.
  *
  * q152 computes the TRAINING statistics (the weighted adjacent-pair
  * counts whose argmax is the next merge); this is the other half:
  * given an ordered merge list, encode words with the classic apply
  * rule (Sennrich et al. '16): repeat — find the LOWEST-RANK merge
  * whose pair occurs adjacent in the current token list, fuse ALL its
  * non-overlapping occurrences left to right — until no merge applies.
  * The ordering subtleties are load-bearing (fusing one occurrence at
  * a time can diverge from the batch rule when a fusion creates a
  * lower-rank pair; BpeSpec pins the batch semantics), and the DuckDB
  * oracle of q244 replays exactly this rule via a recursive CTE.
  *
  * Scale shape: the merge table is vocabulary-sized and BROADCASTS
  * (captured once per partition); encode cost is O(word length ×
  * merges applied) per DISTINCT word — token accounting over a corpus
  * therefore encodes the word table, never the corpus, and joins the
  * counts back (same discipline as q152's pair counting). The
  * per-token fusion is procedural by nature (HF tokenizers are native
  * code for the same reason), so it rides the engine's one sanctioned
  * procedural seam — mapPartitions over the already-deduplicated word
  * table — not a per-row UDF on the corpus scan.
  */
object Bpe {

  /** A small fixed English-ish merge list for pinned queries — the
    * "learned" table, frozen so the oracle can carry the same literal
    * (the precedent of the verbatim keyword tables). Rank = position. */
  val EnglishMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("in", "g"), ("o", "r"),
    ("e", "n"), ("a", "t"), ("e", "s"), ("o", "u"), ("t", "o"),
    ("s", "t"), ("a", "r"), ("o", "f"))

  /** Encode one word under the merge list (classic batch apply; see
    * object doc). `merges` is rank-ordered; `rank` its index map. */
  def applyMerges(word: String, merges: IndexedSeq[(String, String)],
      rank: collection.Map[(String, String), Int]): Seq[String] = {
    var toks: Array[String] = word.map(_.toString).toArray
    var done = toks.length <= 1
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < toks.length - 1) {
        val r = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, r) = merges(best)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < toks.length) {
          if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
            out += l + r; j += 2
          } else { out += toks(j); j += 1 }
        }
        toks = out.toArray
        if (toks.length <= 1) done = true
      }
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(toks)
  }

  /** Appends `out` (array&lt;string&gt; of BPE tokens) for `wordCol`.
    * Runs over the (deduplicated) word table — encode-then-join-back
    * is the corpus shape. */
  def encodeWords(df: DataFrame, wordCol: String,
      merges: Seq[(String, String)], out: String = "bpe"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(out, ArrayType(StringType)))
    val idx = df.schema.fieldIndex(wordCol)
    val m = merges.toIndexedSeq
    df.mapPartitions { it =>
      val rank = m.zipWithIndex.toMap
      it.map(r => Row.fromSeq(r.toSeq :+ applyMerges(r.getString(idx), m, rank)))
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
