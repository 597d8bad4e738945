package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §7.4 #6: top tag sits on
  * 66% of events in the reference corpus — a single reducer would eat
  * the whole shuffle). AQE's skew-join split handles sort-merge cases
  * automatically; this explicit salted join is the fallback for the
  * shapes AQE can't rewrite (e.g. aggregate-after-join pipelines or
  * non-AQE environments).
  *
  * Left (big, skewed) rows get a random salt in [0, saltFactor); the
  * right (small-ish) side is replicated saltFactor times so every
  * (key, salt) bucket finds its match. Key cardinality work splits
  * saltFactor-ways; correctness is unchanged.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation over a skewed key via
    * salting: count/sum-like aggregates compute per (key, salt) first,
    * then merge per key — the map-side-combine pattern made explicit
    * for hot keys. */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int = 8): DataFrame =
    df.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))
}
