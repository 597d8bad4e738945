package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar normalization "standard library" — pure `Column => Column`
  * builders, no UDFs, so every function stays inside whole-stage
  * codegen and remains Catalyst-optimizable (constant folding, null
  * propagation, pushdown through the expression).
  *
  * Semantics follow the reference transformer
  * (`src/utils/transformer_data.py`, SURVEY §2.8 F1–F22):
  *  - booleans: truthy/falsy string tables (F1, transformer_data.py:21-43)
  *  - numerics: EU/US locale-aware parse, null on failure (F2, :45-78)
  *  - strings: whitespace collapse + control strip + truncate (F3, :80-100)
  *  - JSON-ish lists: lenient parse with single-quote repair (F4-F6, :102-212)
  *  - sentinel nulls: '', 'None', 'null', ... → NULL (P8, spark_cleaner.py:54-71)
  */
object Normalize {

  /** F1 `normalize_boolean` (transformer_data.py:21-43).
    * Truthy: true/yes/1/t/y/si/sí — falsy: false/no/0/f/n — else null.
    * Numeric input: non-zero → true. Boolean passthrough.
    */
  def boolean(c: Column): Column = {
    val s = lower(trim(c.cast(StringType)))
    when(c.isNull, lit(null).cast(BooleanType))
      .when(s.isin("true", "yes", "1", "t", "y", "si", "sí"), lit(true))
      .when(s.isin("false", "no", "0", "f", "n"), lit(false))
      // numeric strings beyond 0/1: python bool(int(v)) — nonzero is true
      .when(s.rlike("^-?\\d+(\\.\\d+)?$"), s.cast(DoubleType) =!= 0.0)
      .otherwise(lit(null).cast(BooleanType))
  }

  /** F2 `normalize_numeric`, reference-exact (transformer_data.py:63-75):
    *  - EU `1.234,56`: dots>0 AND exactly one comma AND last ',' after
    *    last '.' → strip dots, comma→dot;
    *  - US thousands `1,234`: commas>0 AND no dots → strip commas
    *    (note: bare "185,22" is treated as thousands → 18522, per the
    *    reference — NOT as an EU decimal);
    *  - anything else parses as-is; failure → null (float() ValueError
    *    ≈ try_cast), so mixed "1,234.56" yields null exactly like the
    *    reference.
    */
  def numeric(c: Column): Column = {
    val s = trim(c.cast(StringType))
    val dots   = length(s) - length(regexp_replace(s, "\\.", ""))
    val commas = length(s) - length(regexp_replace(s, ",", ""))
    // position of last comma/dot: length minus index in reversed string
    val revS = reverse(s)
    val lastComma = when(instr(revS, ",") > 0, length(s) - instr(revS, ",") + 1).otherwise(lit(0))
    val lastDot   = when(instr(revS, ".") > 0, length(s) - instr(revS, ".") + 1).otherwise(lit(0))
    val euForm = (dots > 0) && (commas === 1) && (lastComma > lastDot)
    val usForm = (commas > 0) && (dots === 0)
    val cleaned = when(euForm, regexp_replace(regexp_replace(s, "\\.", ""), ",", "."))
      .when(usForm, regexp_replace(s, ",", ""))
      .otherwise(s)
    when(s.isNull || s === "", lit(null).cast(DoubleType))
      .otherwise(cleaned.try_cast("double"))
  }

  /** F3 `clean_string` (transformer_data.py:80-100): null/blank → null,
    * collapse whitespace runs to one space, strip control chars,
    * truncate to maxLength.
    */
  def cleanString(c: Column, maxLength: Int = 5000): Column = {
    val collapsed = regexp_replace(trim(c.cast(StringType)), "\\s+", " ")
    val stripped  = regexp_replace(collapsed, "[\\x00-\\x1F]", "")
    val truncated = substring(stripped, 1, maxLength)
    when(c.isNull || trim(c.cast(StringType)) === "", lit(null).cast(StringType))
      .otherwise(truncated)
  }

  /** Single→double quote repair used by the reference before JSON
    * parsing (transformer_data.py:116 etc). Documented divergence
    * (SURVEY §0): we only repair when the payload contains no double
    * quotes already, which avoids corrupting `"Lee's team"` values.
    */
  def repairJson(c: Column): Column =
    when(c.contains("\""), c).otherwise(regexp_replace(c, "'", "\""))

  /** F4 `normalize_prices` (transformer_data.py:102-140): JSON-ish list
    * string → Array[Double]; unparsable elements dropped; non-list → null;
    * empty list → null.
    */
  def prices(c: Column): Column = {
    val parsed = from_json(repairJson(trim(c.cast(StringType))), ArrayType(StringType))
    val doubles = filter(
      transform(parsed, x => x.try_cast("double")), x => x.isNotNull)
    when(size(doubles) > 0, doubles).otherwise(lit(null).cast(ArrayType(DoubleType)))
  }

  /** F5 `normalize_outcomes` (transformer_data.py:142-176): list of
    * strings, trimmed + uppercased, blanks dropped, empty → null. */
  def outcomes(c: Column): Column = {
    val parsed = from_json(repairJson(trim(c.cast(StringType))), ArrayType(StringType))
    val cleanedArr = filter(
      transform(parsed, x => upper(trim(x))), x => x.isNotNull && x =!= "")
    when(size(cleanedArr) > 0, cleanedArr).otherwise(lit(null).cast(ArrayType(StringType)))
  }

  /** F6 `parse_tags` (transformer_data.py:178-212): lowercased, trimmed,
    * set-deduped list of tag strings. */
  def tags(c: Column): Column = {
    val parsed = from_json(repairJson(trim(c.cast(StringType))), ArrayType(StringType))
    val cleanedArr = array_distinct(filter(
      transform(parsed, x => lower(trim(x))), x => x.isNotNull && x =!= ""))
    when(size(cleanedArr) > 0, cleanedArr).otherwise(lit(null).cast(ArrayType(StringType)))
  }

  private def blankToNull(c: Column): Column =
    when(c === "", lit(null).cast(StringType)).otherwise(c)

  /** F8 tags-as-objects (loader_NeonDB.py:408-429): JSON list of
    * {label, slug, id} objects → display labels. The 3-way fallback
    * mirrors Python `or`-truthiness exactly: an empty-STRING label
    * falls through to slug then id, but a whitespace-only label is
    * *selected* and then dropped by the post-strip blank check (so
    * `[{'label': ' ', 'slug': 'x'}]` yields nothing for that item, not
    * 'x'). Empty list → empty array (the reference returns [], never
    * None, on this path). Missing keys parse as null struct fields.
    */
  def tagObjectLabels(c: Column): Column = {
    val parsed = from_json(repairJson(trim(c.cast(StringType))),
      lit("array<struct<label: string, slug: string, id: string>>"))
    filter(
      transform(parsed, x =>
        blankToNull(trim(coalesce(
          blankToNull(x.getField("label")),
          blankToNull(x.getField("slug")),
          blankToNull(x.getField("id")))))),
      x => x.isNotNull)
  }

  /** F10 series-id extraction (loader_NeonDB.py:786-807): the field may
    * hold one {'id': ...} object or a list of them; returns the
    * non-blank ids (reference collects them into a distinct set — do
    * that downstream). Non-JSON / blank input → null.
    */
  def seriesIds(c: Column): Column = {
    val repaired = repairJson(trim(c.cast(StringType)))
    val fromList = transform(
      from_json(repaired, lit("array<struct<id: string>>")), x => x.getField("id"))
    val objId = from_json(repaired, lit("struct<id: string>")).getField("id")
    val ids = when(repaired.startsWith("["), fromList)
      .otherwise(when(objId.isNotNull, array(objId)))
    filter(ids, x => x.isNotNull && trim(x) =!= "")
  }

  /** P8 sentinel-null normalization (spark_cleaner.py:54-71). */
  val NullSentinels: Seq[String] =
    Seq("", "none", "null", "n/a", "na", "nan", "nil", "undefined", "-")

  def nullifySentinels(c: Column): Column = {
    val s = lower(trim(c.cast(StringType)))
    when(s.isin(NullSentinels: _*), lit(null).cast(StringType))
      .otherwise(c.cast(StringType))
  }

  /** F11 lenient timestamp parse (pandas errors='coerce'). */
  def timestampLenient(c: Column): Column = try_to_timestamp(c.cast(StringType))

  /** F12 calendar parts, pandas convention: Monday=0 dayofweek, weekend =
    * dow in {5,6} (loader_NeonDB.py:278-282). Spark dayofweek is 1=Sunday
    * → shift with (dow+5)%7.
    */
  def dayOfWeekMonday0(c: Column): Column = (dayofweek(c) + lit(5)) % lit(7)
  def isWeekend(c: Column): Column = dayOfWeekMonday0(c).isin(5, 6)

  /** F18 `outcome_count`: size with null→0 (Spark size(null) = -1). */
  def sizeOrZero(c: Column): Column =
    when(c.isNull, lit(0)).otherwise(size(c))
}
