package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence shaping for LLM training corpora: slicing documents into
  * overlapping context windows ("chunking") and assigning documents to
  * fixed token-budget bins ("packing") — the two transforms between a
  * cleaned corpus and a tokenized training shard.
  *
  * Scale shape: chunking is pure per-row column math (sequence +
  * slice) — scan-side, no shuffle, parallel in the number of input
  * splits. Packing needs a running total, which is computed per
  * `partCol` partition (source / shard / split), never as a global
  * window — the 100 TB contract is "each shard packs independently",
  * exactly how multi-worker training shards are produced.
  */
object Sequencing {

  /** Explode a document into overlapping token windows of `size`
    * tokens every `stride` tokens (stride < size ⇒ overlap). Output:
    * input columns + (chunk_id, n_tok, chunk_fp) where chunk_fp is the
    * md5 of the space-rejoined window — the downstream dedup key. */
  def chunk(docs: DataFrame, text: Column, size: Int, stride: Int,
      keep: Seq[Column]): DataFrame = {
    require(stride > 0 && size > 0, "size and stride must be positive")
    val toks = TextAnalysis.tokens(text)
    val starts = sequence(lit(0), greatest(org.apache.spark.sql.functions.size(toks) - 1, lit(0)), lit(stride))
    docs
      .select(keep :+ toks.as("toks") :+ posexplode(starts).as(Seq("chunk_id", "start")): _*)
      .select(keep :+ col("chunk_id") :+
        slice(col("toks"), col("start") + 1, lit(size)).as("chunk"): _*)
      .where(org.apache.spark.sql.functions.size(col("chunk")) > 0)
      .select(keep :+ col("chunk_id") :+
        org.apache.spark.sql.functions.size(col("chunk")).as("n_tok") :+
        md5(array_join(col("chunk"), " ")).as("chunk_fp"): _*)
  }

  /** Assign each document to a token-budget pack: within each
    * `partCol` partition, documents ordered by `orderCol` accumulate
    * token counts, and a document belongs to the pack its STARTING
    * offset falls in (`cum_before div budget` — documents may straddle
    * pack boundaries, as training-shard writers allow). Output: input
    * columns + (n, pack_id). */
  def packAssign(docs: DataFrame, text: Column, partCol: Column,
      orderCol: Column, budget: Long, keep: Seq[Column]): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Long.MinValue, -1)
    docs
      .select(keep :+ TextAnalysis.tokenCount(text).cast("long").as("n"): _*)
      .withColumn("cum_before", coalesce(sum(col("n")).over(w), lit(0L)))
      // integral `div`, not floor(a / b): `/` on longs is DOUBLE
      // division, which misassigns packs once a shard's running total
      // passes 2^53 (and diverges from the oracle's exact BIGINT `//`)
      .withColumn("pack_id", expr(s"cum_before div ${budget}L"))
      .drop("cum_before")
  }
}
