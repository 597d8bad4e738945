package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy-match join for entity resolution: candidate pairs come
  * from an equi-join on cheap blocking keys (brand, prefix, phonetic
  * code, LSH bucket…), and the edit-distance predicate only runs inside
  * each block. The all-pairs O(n²) comparison a naive fuzzy join does is
  * the canonical non-scalable plan; blocking turns it into a shuffle
  * join whose cost is Σ|block|², tunable by key choice — the same
  * candidate-generation pattern as the MinHash/LSH dedup stack
  * (Dedup.lshCandidates), with edit distance as the verifier instead of
  * Jaccard.
  */
object FuzzyMatch {

  /** probes ⋈ corpus on `blockKey` (equi), refined by
    * levenshtein(probeText, corpusText) <= maxDist. Both inputs keep
    * their own columns; the emitted `dist` column carries the distance.
    * Blocking must be recall-complete for the caller's tolerance (a
    * pair in no common block is never compared — choose keys so true
    * matches share one, e.g. char n-gram bucket or phonetic code).
    *
    * `maxBlockSize` is the hot-block guard (same valve as
    * `Dedup.lshCandidates`): corpus blocks larger than the cap — the
    * boilerplate floods whose |probe_block|×|corpus_block| output
    * would dominate — are dropped before the join, bounding per-key
    * output linearly. Default = unguarded. */
  def blockedLevenshtein(probes: DataFrame, corpus: DataFrame,
      blockKey: String, probeText: Column, corpusText: Column,
      maxDist: Int, maxBlockSize: Int = Int.MaxValue): DataFrame =
    probes.join(Dedup.capBuckets(corpus, blockKey, maxBlockSize), Seq(blockKey))
      .withColumn("dist", levenshtein(probeText, corpusText))
      .where(col("dist") <= maxDist)

  /** Accounting twin of the `maxBlockSize` guard, mirroring
    * [[Dedup.lshDroppedBuckets]]: the corpus blocks a given cap WOULD
    * cut, as (blockKey, block_size) rows. Report it next to a capped
    * match run so "zero matches" can never silently mean "the blocks
    * holding the matches were dropped" — the valve leaves a ledger. */
  def droppedBlocks(corpus: DataFrame, blockKey: String,
      maxBlockSize: Int): DataFrame =
    corpus.groupBy(col(blockKey))
      .agg(count(lit(1)).as("block_size"))
      .filter(col("block_size") > maxBlockSize)
}
