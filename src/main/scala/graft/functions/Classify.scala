package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Keyword-table-driven classification and filtering, the Spark-first
  * re-expression of the reference's domain filters and derived-feature
  * classifiers (SURVEY §2.2 P4–P6, §2.8 F13/F14):
  *  - include/exclude predicate over a precompiled regex alternation
  *    (transformer_data.py:343-382 builds one '|'.join-ed pattern — we
  *    do the same so the scan-side predicate is a single compiled
  *    regex, not N `contains` passes)
  *  - ordered first-match-wins `when`-chain classifier built by
  *    foldLeft over a (keyword → label) table
  *    (transformer_data.py:393-455)
  *
  * All builders return pure `Column` expressions → codegen'd,
  * pushdown-eligible, no UDF SerDe.
  */
object Classify {

  /** Escape a literal keyword for use inside a Java regex alternation. */
  private def escape(kw: String): String =
    java.util.regex.Pattern.quote(kw)

  /** One compiled alternation over all keywords: `kw1|kw2|...`.
    * P4 include / P5 exclude share this (transformer_data.py:368-370). */
  def keywordPattern(keywords: Seq[String]): String =
    keywords.map(escape).mkString("|")

  /** \b-anchored variant (P6, loader_NeonDB.py:775-780). */
  def wordBoundaryPattern(keywords: Seq[String]): String =
    keywords.map(escape).mkString("\\b(", "|", ")\\b")

  /** P4: case-insensitive contains-any-keyword predicate. */
  def containsAny(c: Column, keywords: Seq[String]): Column =
    lower(c).rlike(keywordPattern(keywords.map(_.toLowerCase)))

  /** P5: exclusion predicate (negated include). */
  def containsNone(c: Column, keywords: Seq[String]): Column =
    !containsAny(c, keywords)

  /** F13/F14 generic ordered classifier: first matching keyword wins,
    * `default` otherwise. The `rules` table is ordered — earlier
    * entries shadow later ones, exactly like the reference's ordered
    * dict iteration (transformer_data.py:406-424).
    */
  def keywordClassifier(c: Column, rules: Seq[(String, String)], default: String): Column = {
    val lowered = lower(c)
    rules.foldLeft(Option.empty[Column]) { case (acc, (kw, label)) =>
      val cond = lowered.contains(kw.toLowerCase)
      Some(acc match {
        case None       => when(cond, lit(label))
        case Some(prev) => prev.when(cond, lit(label))
      })
    }.map(_.otherwise(lit(default))).getOrElse(lit(default))
  }

  /** Escape a keyword for embedding in a SQL single-quoted literal. */
  private def sqlLit(s: String): String = s.replace("'", "''")

  /** Mirror of keywordClassifier as ANSI SQL (for the DuckDB oracle):
    * CASE WHEN contains(lower(col), 'kw') THEN 'label' ... — substring
    * contains, not LIKE, so a keyword carrying `%`/`_` can never
    * diverge from the Scala `contains` side. */
  def keywordClassifierSql(col: String, rules: Seq[(String, String)], default: String): String = {
    val whens = rules.map { case (kw, label) =>
      s"WHEN contains(lower($col), '${sqlLit(kw.toLowerCase)}') THEN '${sqlLit(label)}'"
    }.mkString(" ")
    s"CASE $whens ELSE '${sqlLit(default)}' END"
  }

  /** Mirror of containsAny as ANSI SQL — OR-of-contains, same wildcard
    * safety rationale as [[keywordClassifierSql]]. */
  def containsAnySql(col: String, keywords: Seq[String]): String =
    keywords.map(k => s"contains(lower($col), '${sqlLit(k.toLowerCase)}')")
      .mkString("(", " OR ", ")")
}
