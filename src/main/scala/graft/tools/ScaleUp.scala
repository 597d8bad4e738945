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
    replicate(spark, src, dest, "documents", factor, Seq("doc_id"),
      (d, i) => if (i == 0) d
        else d.withColumn("text", concat(col("text"), lit(s" c$i")))
          .withColumn("n_chars", col("n_chars") + lit(3L)))
    replicate(spark, src, dest, "embeddings", factor, Seq("vec_id"),
      (d, i) => if (i == 0) d
        else d.withColumn("embedding",
          transform(col("embedding"), x => x + lit(i.toFloat * 1e-3f))))
    spark.stop()
  }
}
