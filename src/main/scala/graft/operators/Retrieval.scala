package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: TF-IDF and BM25 scoring
  * with top-k ranking — the classic "find training examples matching a
  * probe query" primitive of a data-curation pipeline (the reference
  * ranks markets by keyword relevance in its filter stage,
  * transformer_data.py:343-382; this generalizes that to scored
  * retrieval instead of boolean keep/drop).
  *
  * Scale shape: term statistics are one explode + two aggregations —
  * both shuffle (doc_id, word) pairs, never document text. The query
  * term set is a literal IN-list pushed into the tf aggregation, so the
  * scored frame is |terms| × |matching docs|, tiny next to the corpus.
  * Global N and avgdl are single-row aggregates joined via broadcast
  * (no driver collect in the plan). Everything downstream of the
  * explode is integer/double column math — whole-stage codegen'd.
  */
object Retrieval {

  /** (id, word, tf) term frequencies, whitespace tokenization (same
    * tokenizer the dedup/quality stack uses, proven ≡ the DuckDB
    * oracle's string_split_regex in q23). */
  def termFrequencies(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs
      .select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))

  /** (word, df) document frequencies from a term-frequency frame. */
  def docFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy("word").agg(count(lit(1)).as("df"))

  /** Smoothed inverse document frequency: ln((N+1)/(df+1)) + 1 — never
    * negative, defined for unseen terms. */
  def idfSmoothed(df: Column, n: Column): Column =
    log((n.cast("double") + 1.0) / (df.cast("double") + 1.0)) + 1.0

  /** BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)). */
  def idfBm25(df: Column, n: Column): Column =
    log(lit(1.0) + (n.cast("double") - df.cast("double") + 0.5) /
      (df.cast("double") + 0.5))

  /** Top-k documents by summed TF-IDF over `terms`. Output:
    * (doc_id, hits, score) — `hits` = how many query terms matched.
    * Scores are rounded to 4 dp and the rounded value drives the
    * ranking, so downstream consumers (and the cross-engine oracle)
    * see a total, reproducible order (ties → doc_id). */
  def tfidfTopK(docs: DataFrame, id: Column, text: Column,
      terms: Seq[String], k: Int): DataFrame = {
    // filter to the query terms BEFORE both consumers and lazily
    // materialize the (tiny) surviving tf rows once: df is only ever
    // consumed for the query terms, so computing docFrequencies over
    // the full corpus ran the tokenize+explode+aggregate lineage a
    // second time for rows the join immediately dropped. df values for
    // the terms are identical by construction (tf is unique per
    // (doc, word)).
    val tf = termFrequencies(docs, id, text)
      .where(col("word").isin(terms: _*))
      .localCheckpoint(false)
    val df = docFrequencies(tf)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf
      .join(broadcast(df), "word")
      .crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("hits"),
        round(sum(col("tf").cast("double") *
          idfSmoothed(col("df"), col("n_docs"))), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Top-k documents by BM25(k1, b) over `terms`. Output:
    * (doc_id, hits, score); same rounded-rank determinism contract as
    * [[tfidfTopK]]. Document length is the whitespace token count;
    * avgdl is the corpus mean length (broadcast single row). */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // same terms-first filter + one materialization as tfidfTopK
    val tf = termFrequencies(docs, id, text)
      .where(col("word").isin(terms: _*))
      .localCheckpoint(false)
    val df = docFrequencies(tf)
    val lens = docs.select(id.as("doc_id"),
      TextAnalysis.tokenCount(text).cast("double").as("dl"))
    // corpus stats derive from lens — aggregating the frame that's
    // already in the plan, not a third tokenization pass over the text
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tfd = col("tf").cast("double")
    val score = idfBm25(col("df"), col("n_docs")) *
      (tfd * (k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    tf
      .join(broadcast(df), "word")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("hits"), round(sum(score), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Hard-negative mining for retrieval training (the "dense
    * retrievers need BM25 negatives" recipe — Karpukhin et al. 2020,
    * DPR): every PROBE document queries the corpus with its
    * `termsPerProbe` most DISCRIMINATIVE terms (lowest df, ties broken
    * by word for a total order), and its top-k BM25 hits OUTSIDE its
    * own source (and itself) are emitted as hard negatives — lexically
    * close, provenance-disjoint. Query terms weigh 1 each (classic
    * query-side BM25).
    *
    * Term selection is RELATIVE per probe, not an absolute df cap: an
    * absolute cap is scale-fragile (a cap that keeps sf1's tail
    * vocabulary selects NOTHING on a small corpus whose every word is
    * common — the vacuous-green failure mode) and corpus-fragile (a
    * chatty corpus blows past it). The rarest-m terms always exist, so
    * the query never silently degenerates to zero candidates, and the
    * candidate join stays bounded by |probes| · m posting lists — the
    * SHORTEST lists the probe has, the WAND intuition. `dfCapFrac`
    * remains an optional hard valve (default 1.0 = off) for corpora
    * where even the rarest probe terms are stopword-grade; when it
    * fires it drops terms, never probes. The per-probe term ranking is
    * a window partitioned BY PROBE over ≤ |probe's vocab| rows — never
    * a global window. Ranking runs through the bounded-heap TopKPerKey
    * operator — no per-probe sort, no single-partition window.
    */
  def hardNegatives(docs: DataFrame, id: Column, text: Column, source: Column,
      probe: Column, k: Int, termsPerProbe: Int = 8, dfCapFrac: Double = 1.0,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(id.as("doc_id"), source.as("src"),
      probe.as("is_probe"), text.as("__text"))
    val tf = termFrequencies(base, col("doc_id"), col("__text"))
    val dfr = docFrequencies(tf)
    val lens = base.select(col("doc_id"),
      TextAnalysis.tokenCount(col("__text")).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val qWords = tf
      .join(base.where(col("is_probe"))
        .select(col("doc_id").as("qid"), col("src").as("qsrc")),
        tf("doc_id") === col("qid"))
      .select(col("qid"), col("qsrc"), col("word"))
    import org.apache.spark.sql.expressions.Window
    val qTerms = qWords
      .join(broadcast(dfr), "word")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("df"), col("word"))))
      .where(col("__rn") <= termsPerProbe)
      .drop("__rn")
    val postings = tf.join(base.select(col("doc_id"), col("src")), "doc_id")
    val tfd = col("tf").cast("double")
    val scoreTerm = idfBm25(col("df"), col("n_docs")) * (tfd * (k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    val scored = qTerms
      .crossJoin(broadcast(stats))
      .where(col("df").cast("double") <= col("n_docs").cast("double") * dfCapFrac)
      .join(postings, "word")
      .where(col("doc_id") =!= col("qid") && col("src") =!= col("qsrc"))
      .join(lens, "doc_id")
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("hits"), round(sum(scoreTerm), 4).as("score"))
    graft.plans.TopK.perKey(scored, Seq("qid"), "score", "doc_id", k)
      .orderBy(col("qid"), col("score").desc, col("doc_id"))
  }
}
