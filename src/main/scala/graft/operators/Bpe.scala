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

  /** One learned merge: the fused pair, its weighted adjacent-pair
    * count at selection time, and the vocab's total weighted token
    * count AFTER applying it (strictly decreasing — the training
    * progress curve). */
  final case class LearnedMerge(l: String, r: String, pairCount: Long,
      tokensAfter: Long)

  /** BPE TRAINING — learn `k` merges from a (word, count) vocabulary
    * (Sennrich et al. '16): iterate k times — count every adjacent
    * token pair weighted by word frequency, fuse the argmax pair
    * (ties: count desc, then pair lexicographic) across the whole
    * vocab left-to-right non-overlapping, repeat on the new
    * tokenization. Closes the loop with [[encodeWords]]: q152 computes
    * one round of these statistics; this runs the full course and the
    * learned table feeds the encoder.
    *
    * Scale shape: everything runs on the DEDUPLICATED word table
    * (vocabulary-scaled, never corpus-scaled); per round, one
    * pair-count aggregation plus a ONE-ROW argmax collect reach the
    * driver — k rows total, the k-means-centroids discipline. Each
    * round ends in an eager localCheckpoint: the fold-apply doubles
    * the plan per round otherwise.
    *
    * The per-round single-merge application is a left-to-right greedy
    * fold: a fused token never equals the merge's own LEFT element
    * (products are strictly longer), so the fold cannot spuriously
    * re-fuse its own output — making it equivalent to scan-and-skip,
    * which is what the DuckDB oracle replays with `replace()`. */
  def learnMerges(words: DataFrame, wordCol: String, countCol: String,
      k: Int): Seq[LearnedMerge] = {
    import org.apache.spark.sql.functions._
    require(k >= 1, s"learnMerges: k must be >= 1, got $k")
    var cur = words
      .select(col(countCol).cast("long").as("wc"),
        split(col(wordCol), "").as("toks"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[LearnedMerge]
    var round = 0
    while (round < k) {
      val pairs = cur.where(size(col("toks")) >= 2)
        .select(col("wc"), explode(transform(
          sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("l"),
            element_at(col("toks"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      require(pairs.nonEmpty,
        s"learnMerges: vocabulary exhausted after ${out.size} merges (asked $k)")
      val (l, r, n) = (pairs(0).getString(0), pairs(0).getString(1),
        pairs(0).getLong(2))
      cur = cur.withColumn("toks", applyOneMerge(col("toks"), l, r))
        .localCheckpoint(true)
      val toksAfter = cur
        .agg(sum(col("wc") * size(col("toks"))).cast("long")).collect()(0).getLong(0)
      out += LearnedMerge(l, r, n, toksAfter)
      round += 1
    }
    out.toSeq
  }

  /** Fuse every left-to-right non-overlapping adjacent (l, r) in a
    * token array — one training round's application, as a fold (see
    * [[learnMerges]] for why the fold is equivalent to scan-and-skip). */
  private[graft] def applyOneMerge(toks: org.apache.spark.sql.Column,
      l: String, r: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // size==0 branches FIRST: ANSI mode makes element_at(acc, -1)
    // throw on an empty array, and CaseWhen is the sanctioned
    // short-circuit
    aggregate(toks, array().cast("array<string>"), (acc, t) =>
      when(size(acc) === 0, array(t))
        .when(element_at(acc, -1) === lit(l) && t === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(t))))
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
