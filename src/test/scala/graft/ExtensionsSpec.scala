package graft

import graft.functions.CosineSimilarityExpr
import graft.operators.Similarity
import graft.plans.{GraftExtensions, NativizeCosine}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions entry point and the Nativize* optimizer
  * rules. Since round 11, `Sessions.local` builds the session WITH
  * `GraftExtensions`, so the shared suite session itself proves the
  * injected route; the `extraOptimizations` child-session tests keep
  * pinning each rule in isolation, and the extensions object's full
  * surface is verified through its public build* probes. */
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

  test("the shared session carries the extensions: cosine nativizes by default") {
    // Sessions.local builds with GraftExtensions (round 11) — the rule
    // fires WITHOUT any extraOptimizations opt-in
    val plain = vecs(spark).select(Similarity.cosine(col("a"), col("b")).as("sim"))
    assert(hasNativeCosine(plain),
      "Sessions.local session must carry the injected optimizer rules")
  }

  private def hasHash60(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.expressions.exists(
      _.exists(_.isInstanceOf[graft.functions.Hash60Expr])))

  test("NativizeHash60 rewrites declarative tokenHash60 and preserves every value") {
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(graft.plans.NativizeHash60)
    val docs = Tables.documents(child, sf).limit(50)
    val declarative = docs.select(col("doc_id"),
      graft.functions.TextAnalysis.tokenHash60(col("text")).as("h"))
    assert(hasHash60(declarative), "optimized plan should carry hash60_native")
    val expected = docs.select(col("doc_id"),
      graft.functions.Natives.hash60(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val got = declarative.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(got == expected)
    // the shared extensions-built session also rewrites (same rule,
    // injected instead of opted into)
    assert(hasHash60(Tables.documents(spark, sf).limit(5).select(
      graft.functions.TextAnalysis.tokenHash60(col("text")).as("h"))))
  }

  test("NativizeHash60 leaves non-matching conv/substring shapes alone") {
    val child = spark.newSession()
    child.experimental.extraOptimizations = Seq(graft.plans.NativizeHash60)
    val docs = Tables.documents(child, sf).limit(5)
    // 14 hex chars, not the contract's 15 — must not rewrite
    val other = docs.select(conv(substring(md5(col("text")), 1, 14), 16, 10)
      .cast("long").as("h"))
    assert(!hasHash60(other))
  }

  test("GraftExtensions injects the full native function surface plus the optimizer rule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    val rules = org.apache.spark.sql.GraftExtensionsProbe.optimizerRules(ext, spark)
    assert(rules.contains(NativizeCosine))
    // the SQL DML rule rides the resolution batch
    val res = org.apache.spark.sql.GraftExtensionsProbe.resolutionRules(ext, spark)
    assert(res.exists(_.isInstanceOf[graft.plans.GraftSqlDmlRule]),
      "GraftSqlDmlRule missing from injected resolution rules")
    val reg = org.apache.spark.sql.GraftExtensionsProbe.registerFunctions(ext,
      org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    graft.functions.NativeRegistry.builders.foreach { case (name, _) =>
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from extension-registered functions")
    }
  }
}
