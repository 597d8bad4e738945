package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Corpus-curation primitives a large-scale training-data pipeline
  * needs beyond document-level dedup: sub-document ("line"-level)
  * chunking for CCNet-style repeated-passage removal, PII detection /
  * redaction, and URL→domain normalization. All pure Column
  * expressions — codegen-friendly, no UDFs — so they ride inside
  * whole-stage codegen next to the scan.
  *
  * Reference parallel: the cleaning layer of `transformer_data.py`
  * (clean_string :77-100, keyword filters :343-382) stops at document
  * granularity; these extend the same declarative style below the
  * document boundary (SURVEY §7.5 north star).
  */
object Curation {

  /** Consecutive non-overlapping `width`-token chunk strings — the
    * "lines" of a corpus whose documents carry no newlines. Only full
    * chunks are emitted (a trailing partial chunk would hash
    * differently under padding and break cross-corpus matching).
    */
  def chunks(textCol: Column, width: Int): Column = {
    val t = TextAnalysis.tokens(textCol)
    // exact for any realistic token count (< 2^52): int/double divide
    // then floor, because Column `/` on ints is double division
    val n = floor(size(t) / lit(width.toDouble)).cast(IntegerType)
    when(n >= 1,
      transform(sequence(lit(0), n - 1),
        i => array_join(slice(t, i * width + 1, lit(width)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** PII patterns. RE2-compatible (no lookarounds) so the DuckDB
    * oracle's regexp engine and Java's agree token-for-token. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe: String = "\\b555-\\d{4}\\b"
  val Ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Number of non-overlapping matches of `re` in the column. */
  def countMatches(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Redact all three PII classes. Email first: its character class
    * overlaps the IP pattern's digits-and-dots, so the wider pattern
    * must consume its text before the narrower ones run. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>")),
      lit(Ipv4Re), lit("<IP>"))

  /** Registrable domain of the first http(s) URL in the column (empty
    * string when none) — the key for per-domain corpus accounting. */
  def domain(c: Column): Column =
    regexp_extract(c, "https?://([A-Za-z0-9.-]+)", 1)

  /** Sliding word n-grams (space-joined) — the unit of the Gopher
    * repetition signals below. Empty array when the text has fewer
    * than `n` tokens. */
  def wordNgrams(textCol: Column, n: Int): Column =
    graft.functions.Natives.wordNgrams(textCol, n)

  /** The declarative twin of [[wordNgrams]] — kept so the spec can pin
    * bit-identity against the codegen'd native (the house rule for
    * every nativized hot path). Not for production scans: the lambda
    * evaluates interpreted per window and allocates a slice per gram
    * inside a corpus-sized explode. (Fun fact from measuring: this
    * slice + array_join form is itself 2× faster than the "obvious"
    * unrolled ANSI element_at + concat_ws variant.) */
  private[graft] def wordNgramsDeclarative(textCol: Column, n: Int): Column = {
    val t = TextAnalysis.tokens(textCol)
    // null in, null out — matching the native's nullSafeEval convention
    when(textCol.isNull, lit(null).cast(ArrayType(StringType)))
      .when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => array_join(slice(t, i + 1, lit(n)), " ")))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** GOPHER-style repetition signals (Rae et al. 2021 §A1.1, the
    * public quality-filter recipe): per document,
    *
    *  - `top_frac`  — fraction of the text's characters covered by
    *    occurrences of the MOST FREQUENT `topN`-gram
    *    (`count * length(gram) / length(text)`; ties break to the
    *    lexicographically LARGEST gram, pinned so the oracle's window
    *    and Spark's `max_by` agree);
    *  - `dup_frac`  — fraction of characters inside `dupN`-grams that
    *    occur at least twice (`Σ count*length(gram) / length(text)`
    *    over repeated grams; >1 is possible for overlapping grams and
    *    fine — the signal thresholds, it doesn't normalize).
    *
    * Docs too short for a gram get 0.0 on both. 100 TB shape: one
    * explode + `(id, gram)` hash aggregation with map-side partials,
    * then an `(id)`-keyed reduce — no window over the corpus, no
    * driver state; the gram space is bounded by total token count.
    * Returns `(id, top_frac, dup_frac)` under the caller's id name. */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame, idName: String,
      textCol: Column, topN: Int = 2, dupN: Int = 3): org.apache.spark.sql.DataFrame = {
    val id = col(idName)
    val base = df.select(id.as(idName), length(textCol).as("__len"),
      textCol.as("__text"))
    def gramCounts(n: Int) = base
      .select(id, col("__len"), explode(wordNgrams(col("__text"), n)).as("__g"))
      .groupBy(id, col("__len"), col("__g"))
      .agg(count(lit(1)).as("__cnt"))
    val top = gramCounts(topN)
      .groupBy(id)
      .agg((max_by(col("__cnt") * length(col("__g")),
        struct(col("__cnt"), col("__g"))) / max(col("__len"))).as("top_frac"))
    val dup = gramCounts(dupN)
      .groupBy(id)
      .agg((coalesce(sum(when(col("__cnt") >= 2,
        col("__cnt") * length(col("__g")))), lit(0L)) / max(col("__len")))
        .as("dup_frac"))
    base.select(id)
      .join(top, Seq(idName), "left")
      .join(dup, Seq(idName), "left")
      .select(id, coalesce(col("top_frac"), lit(0.0)).as("top_frac"),
        coalesce(col("dup_frac"), lit(0.0)).as("dup_frac"))
  }
}
