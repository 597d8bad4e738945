package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * the equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. Keeping both in one value prevents name/semantics drift —
  * the driver's compare hashes values under sorted column names, so the
  * Spark aliases and SQL aliases MUST match exactly.
  *
  * @param benchmark whether Bench.scala includes it in the headline set
  */
case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    benchmark: Boolean = false)

/** Oracle-SQL fragments shared across query modules. These pair with
  * fixed Scala twins (`TextAnalysis.tokens` / `tokenHash60`), so they
  * live in exactly ONE place — a tokenizer or hash-width change edited
  * here cannot silently leave one module's oracles behind.
  */
object OracleSql {
  /** DuckDB twin of `TextAnalysis.tokens(text)`. */
  val toksSql = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

  /** DuckDB twin of `TextAnalysis.tokenHash60` applied to SQL expr `x`. */
  def h60of(x: String): String =
    s"CAST('0x' || substring(md5($x), 1, 15) AS BIGINT)"
}

object Registry {
  /** All registered queries, assembled by module. */
  def allQueries: Seq[GQuery] =
    CoreQueries.all ++ TextQueries.all ++ LlmQueries.all ++ StarQueries.all ++
      ParserQueries.all ++ EsportsQueries.all ++ TemporalQueries.all ++
      RetrievalQueries.all ++ PipelineQueries.all ++ StatsQueries.all ++
      CurationQueries.all ++ AnalyticsQueries.all ++ DatalakeQueries.all ++
      BasketQueries.all
}
