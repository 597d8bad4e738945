package graft.tools

import graft.Sessions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize a larger scale factor from an existing one for BENCH
  * scale-point runs (never for correctness — the oracle always runs
  * on driver-generated data): `factor` key-shifted copies of every
  * fact table, with foreign keys shifted by the SAME stride so join
  * semantics and selectivities survive. Text gets a per-copy suffix
  * and embeddings a per-copy epsilon so dedup/ANN workloads don't
  * degenerate into 10-way exact ties. Dims (region/nation) copy
  * as-is.
  *
  * Usage: ScaleUp <srcDir> <destDir> [factor=10]
  */
object ScaleUp {

  private val KeyStride = 10000000L // > any key in any source table

  private def shifted(df: DataFrame, i: Int, keyCols: Seq[String]): DataFrame =
    keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * KeyStride)))

  private def replicate(spark: SparkSession, src: String, dest: String,
      table: String, factor: Int, keyCols: Seq[String],
      perturb: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
    val base = spark.read.parquet(s"$src/$table.parquet")
    val out = (0 until factor).map(i => perturb(shifted(base, i, keyCols), i))
      .reduce(_ unionByName _)
    out.write.mode("overwrite").parquet(s"$dest/$table.parquet")
    println(s"[scaleup] $table x$factor -> ${out.count()} rows")
  }

  def main(args: Array[String]): Unit = {
    val src = args(0); val dest = args(1)
    val factor = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val spark = Sessions.local()
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dest/$t.parquet")
    }
    replicate(spark, src, dest, "customer", factor, Seq("c_custkey"))
    replicate(spark, src, dest, "supplier", factor, Seq("s_suppkey"))
    replicate(spark, src, dest, "part", factor, Seq("p_partkey"))
    replicate(spark, src, dest, "orders", factor,
      Seq("o_orderkey", "o_custkey"))
    replicate(spark, src, dest, "lineitem", factor,
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate(spark, src, dest, "events", factor,
      Seq("event_id", "user_id"))
    // VOCAB-PRESERVING text perturbation: append the doc's own first
    // token i times. Exact-dup detectors see distinct texts, shingle
    // hashes shift (near-dup detectors see real work), but the token
    // SET of every doc is unchanged — so set-similarity operators keep
    // their vocabulary and distinct-set profile and absorb the copies
    // as multiplicities, the way a template-flooded corpus actually
    // behaves. (A fresh `c$i` token here once grew the q144 vocabulary
    // past the 62-bit mask gate and forced the prefix path into its
    // known-quadratic template regime: 45 min at sf1.)
    replicate(spark, src, dest, "documents", factor, Seq("doc_id"),
      (d, i) => if (i == 0) d
        else {
          val tok = element_at(split(col("text"), "\\s+"), 1)
          val txt = concat(col("text"),
            array_join(array_repeat(concat(lit(" "), tok), i), ""))
          d.withColumn("text", txt)
            .withColumn("n_chars", length(col("text")).cast("long"))
        })
    // copies 1–2 stay NEAR-duplicates (epsilon shift: near-dup and
    // SemDeDup operators get 3-way clusters, ~3× the pair density);
    // copies 3+ get direction-varying noise strong enough to drop
    // below any near-dup cosine threshold — otherwise every vector is
    // a 10-way dup cluster and bucket pairing does 100× the work of a
    // genuine 10× corpus (measured: 66× on q82 at sf1)
    replicate(spark, src, dest, "embeddings", factor, Seq("vec_id"),
      (d, i) => if (i == 0) d
        else if (i <= 2) d.withColumn("embedding",
          transform(col("embedding"), x => x + lit(i.toFloat * 1e-3f)))
        else d.withColumn("embedding",
          // the noise DIRECTION must be pseudo-random PER VECTOR — a
          // linear pattern mod a small prime yields only a handful of
          // distinct directions, i.e. giant near-parallel clusters
          // (measured: q82 46 s → 269 s); hash(vec_id, dim, copy)
          // gives every vector its own direction
          transform(col("embedding"), (x, idx) =>
            x + lit(0.35f * i) *
              (pmod(hash(col("vec_id"), idx, lit(i)), lit(7)) - lit(3))
                .cast("float"))))
    spark.stop()
  }
}
