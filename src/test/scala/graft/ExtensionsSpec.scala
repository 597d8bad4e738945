package graft

import graft.functions.CosineSimilarityExpr
import graft.operators.Similarity
import graft.plans.{GraftExtensions, NativizeCosine}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions entry point and the NativizeCosine
  * optimizer rule. End-to-end runs use `experimental.extraOptimizations`
  * on a fresh child session (a second `getOrCreate` would just return
  * the suite's shared session, so the `spark.sql.extensions` config
  * route can't be exercised inside one test JVM — the extensions object
  * itself is verified through its public build* surface instead). */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  private def hasNativeCosine(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.expressions.exists(
      _.exists(_.isInstanceOf[CosineSimilarityExpr])))

  // File-backed inputs: a local Seq-relation gets eagerly collapsed by
  // ConvertToLocalRelation before user-provided optimizer rules see it.
  private def vecs(s: org.apache.spark.sql.SparkSession) = {
    val emb = Tables.embeddings(s, sf).limit(10)
    emb.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("a"),
      reverse(Similarity.asDouble(col("embedding"))).as("b"))
  }

  test("NativizeCosine rewrites the declarative cosine into the codegen'd expression") {
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(NativizeCosine)
    val df = vecs(child)
    val declarative = df.select(col("vec_id"), Similarity.cosine(col("a"), col("b")).as("sim"))
    assert(hasNativeCosine(declarative), "optimized plan should carry cosine_native")
    val expected = df.select(col("vec_id"), Similarity.cosineNative(col("a"), col("b")).as("sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    val got = declarative.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    assert(got == expected)
  }

  test("NativizeCosine leaves non-cosine aggregate/zip_with shapes alone") {
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(NativizeCosine)
    val df = vecs(child)
    // a dot product alone (no norm quotient) must NOT be rewritten
    val dotOnly = df.select(Similarity.dot(col("a"), col("b")).as("d"))
    assert(!hasNativeCosine(dotOnly))
    // a quotient whose denominator mixes different vectors must not match
    val mixed = df.select((Similarity.dot(col("a"), col("b")) /
      (sqrt(Similarity.dot(col("a"), col("a"))) * sqrt(Similarity.dot(col("a"), col("b"))))).as("x"))
    assert(!hasNativeCosine(mixed))
  }

  test("rule does not fire on the shared session (no extraOptimizations)") {
    val plain = vecs(spark).select(Similarity.cosine(col("a"), col("b")).as("sim"))
    assert(!hasNativeCosine(plain), "shared session has no extraOptimizations")
  }

  test("GraftExtensions injects the full native function surface plus the optimizer rule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val rules = org.apache.spark.sql.GraftExtensionsProbe.optimizerRules(ext, spark)
    assert(rules.contains(NativizeCosine))
    val reg = org.apache.spark.sql.GraftExtensionsProbe.registerFunctions(ext,
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    graft.functions.NativeRegistry.builders.foreach { case (name, _) =>
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from extension-registered functions")
    }
  }
}
