package graft.queries

import graft.Tables
import graft.operators.{Joins, Sequencing}
import org.apache.spark.sql.functions._

/** Scale-pipeline coverage: the operators a 100 TB curation/warehouse
  * pipeline runs around the per-row transforms — runtime-filter-style
  * join pruning, repetition quality gates, context-window chunking,
  * token-budget packing, and SCD2 history builds. Every query's result
  * is exact (bloom false positives are scrubbed by the exact join that
  * follows), so each has a full DuckDB oracle twin.
  */
object PipelineQueries {

  /** Bloom-prune + exact join: revenue of lineitems belonging to
    * high-value orders. The bloom filter drops ~80% of the fact scan
    * before the shuffle; the exact join afterwards removes bloom false
    * positives, so the result ≡ the plain join the oracle runs. */
  val q96BloomPrune = GQuery(
    "q96_bloom_prune",
    (s, d) => {
      import s.implicits._
      val hi = Tables.orders(s, d)
        .where($"o_totalprice" > 450000.0)
        .select($"o_orderkey", $"o_orderpriority")
      val pruned = Joins.bloomPrune(
        Tables.lineitem(s, d), $"l_orderkey", hi, $"o_orderkey",
        numItems = 100000L)
      pruned
        .join(hi, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n_items"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
            .as("revenue"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n_items,
           |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |WHERE o_totalprice > 450000.0
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Gopher-style repetition quality gate: per-document duplicate-token
    * fraction (1 − unique/total) and top-token share, flagged against
    * thresholds and rolled up per source. The per-doc ratios are
    * int÷int quotients — bit-identical cross-engine, so the flag
    * comparisons can't straddle engines; only the avg() is rounded.
    * Scale: one explode + two (doc_id-keyed) aggregations, no text on
    * the shuffle after tokenization. */
  val q97RepetitionQuality = GQuery(
    "q97_repetition_quality",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val per = graft.operators.Retrieval
        .termFrequencies(docs, $"doc_id", $"text")
        .groupBy("doc_id")
        .agg(sum($"tf").as("n_tok"), count(lit(1)).as("n_uniq"),
          max($"tf").as("top_tf"))
        .select($"doc_id",
          (lit(1.0) - $"n_uniq".cast("double") / $"n_tok".cast("double"))
            .as("dup_frac"),
          ($"top_tf".cast("double") / $"n_tok".cast("double")).as("top_share"))
      docs.select($"doc_id", $"source")
        .join(per, "doc_id")
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          count(when($"dup_frac" > 0.55 || $"top_share" > 0.15, 1))
            .as("n_flagged"),
          round(avg($"dup_frac"), 4).as("avg_dup_frac"),
          round(avg($"top_share"), 4).as("avg_top_share"))
        .orderBy($"source")
    },
    Some("""WITH tf AS (
           |  SELECT doc_id, word, count(*) AS tf FROM (
           |    SELECT doc_id,
           |           unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS word
           |    FROM documents)
           |  GROUP BY doc_id, word),
           |per AS (
           |  SELECT doc_id,
           |         1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(tf) AS DOUBLE) AS dup_frac,
           |         CAST(max(tf) AS DOUBLE) / CAST(sum(tf) AS DOUBLE) AS top_share
           |  FROM tf GROUP BY doc_id)
           |SELECT source, count(*) AS n_docs,
           |       count(*) FILTER (WHERE dup_frac > 0.55 OR top_share > 0.15) AS n_flagged,
           |       round(avg(dup_frac), 4) AS avg_dup_frac,
           |       round(avg(top_share), 4) AS avg_top_share
           |FROM documents JOIN per USING (doc_id)
           |GROUP BY source ORDER BY source""".stripMargin))

  /** Context-window chunking: 64-token windows every 48 tokens
    * (16-token overlap), one row per chunk with its token count and
    * dedup fingerprint. Spark `sequence`+`slice` ≡ DuckDB
    * `range`+`list_slice` — both include a start at every stride
    * offset < len and clamp the final window. */
  val q98TokenChunks = GQuery(
    "q98_token_chunks",
    (s, d) => {
      import s.implicits._
      Sequencing.chunk(Tables.documents(s, d), $"text",
        size = 64, stride = 48, keep = Seq($"doc_id"))
    },
    benchmark = true,
    oracle =
    Some("""WITH t AS (
           |  SELECT doc_id,
           |         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, unnest(range(0, greatest(len(toks), 1), 48)) AS start, toks
           |  FROM t)
           |SELECT doc_id, CAST(start // 48 AS INT) AS chunk_id,
           |       CAST(len(list_slice(toks, start + 1, start + 64)) AS INT) AS n_tok,
           |       md5(array_to_string(list_slice(toks, start + 1, start + 64), ' ')) AS chunk_fp
           |FROM c WHERE len(list_slice(toks, start + 1, start + 64)) > 0""".stripMargin))

  /** Token-budget packing: per source (the shard unit), documents in
    * doc_id order are assigned to 512-token packs by starting offset;
    * rolled up to pack occupancy. The running sum is windowed WITHIN
    * source — no global single-partition window. */
  val q99SequencePacking = GQuery(
    "q99_sequence_packing",
    (s, d) => {
      import s.implicits._
      Sequencing.packAssign(Tables.documents(s, d), $"text",
          partCol = $"source", orderCol = $"doc_id", budget = 512L,
          keep = Seq($"source", $"doc_id"))
        .groupBy($"source", $"pack_id")
        .agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
        .orderBy($"source", $"pack_id")
    },
    Some("""WITH lens AS (
           |  SELECT source, doc_id,
           |         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n
           |  FROM documents),
           |c AS (
           |  SELECT source, doc_id, n,
           |         COALESCE(sum(n) OVER (PARTITION BY source ORDER BY doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
           |  FROM lens)
           |SELECT source, CAST(cum_before // 512 AS BIGINT) AS pack_id,
           |       count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
           |FROM c GROUP BY source, cum_before // 512
           |ORDER BY source, pack_id""".stripMargin))

  /** SCD Type-2 user-state history: each user's consecutive runs of
    * the same event_type collapse to versioned validity intervals.
    * Timestamps cross the compare wire as epoch microseconds (BIGINT
    * both engines — events.ts is ns-precision parquet, µs is the
    * shared floor). */
  val q100Scd2History = GQuery(
    "q100_scd2_history",
    (s, d) => {
      import s.implicits._
      graft.operators.Temporal
        .scd2(Tables.events(s, d), "user_id", "event_type", "ts", "event_id")
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("valid_from_us"),
          unix_micros($"valid_to").as("valid_to_us"),
          $"version", $"is_current")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_type, ts, event_id,
           |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
           |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           |  FROM events),
           |ch AS (
           |  SELECT user_id, event_type, ts, event_id FROM e
           |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
           |SELECT user_id, event_type,
           |       epoch_us(ts) AS valid_from_us,
           |       epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_us,
           |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version,
           |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
           |FROM ch""".stripMargin))

  /** Blocked fuzzy-match join (entity resolution): probes are parts
    * with a one-char corruption of their name; candidates come from a
    * brand-block equi-join; levenshtein ≤ 2 verifies. Detail rows
    * (probe, match, distance) go to the oracle — Spark and DuckDB
    * levenshtein are both plain unit-cost edit distance. */
  val q101FuzzyMatch = GQuery(
    "q101_fuzzy_match",
    (s, d) => {
      import s.implicits._
      val parts = Tables.part(s, d).select($"p_partkey", $"p_name", $"p_brand")
      val probes = parts
        .where(pmod($"p_partkey", lit(7)) === 0)
        .select($"p_partkey".as("probe_key"),
          concat(lit("x"), expr("substring(p_name, 2)")).as("probe_name"),
          $"p_brand")
      graft.operators.FuzzyMatch
        .blockedLevenshtein(probes, parts, "p_brand",
          $"probe_name", $"p_name", maxDist = 2)
        .select($"probe_key", $"p_partkey".as("match_key"), $"dist")
    },
    Some("""WITH probes AS (
           |  SELECT p_partkey AS probe_key, 'x' || substr(p_name, 2) AS probe_name, p_brand
           |  FROM part WHERE p_partkey % 7 = 0)
           |SELECT probe_key, p.p_partkey AS match_key,
           |       CAST(levenshtein(probe_name, p.p_name) AS INT) AS dist
           |FROM probes JOIN part p USING (p_brand)
           |WHERE levenshtein(probe_name, p.p_name) <= 2""".stripMargin))

  /** Inverted index build: word → document-frequency + sorted posting
    * list (pipe-joined on the wire — the driver compare can't hash
    * arrays). The posting list is the retrieval-side dual of q94's
    * forward tf table. */
  val q102InvertedIndex = GQuery(
    "q102_inverted_index",
    (s, d) => {
      import s.implicits._
      graft.operators.Retrieval
        .termFrequencies(Tables.documents(s, d), $"doc_id", $"text")
        .groupBy($"word")
        .agg(
          count(lit(1)).as("df"),
          sum($"tf").as("total_tf"),
          array_join(sort_array(collect_set($"doc_id")).cast("array<string>"), "|")
            .as("postings"))
        .orderBy($"word")
    },
    Some("""WITH tf AS (
           |  SELECT doc_id, word, count(*) AS tf FROM (
           |    SELECT doc_id,
           |           unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS word
           |    FROM documents)
           |  GROUP BY doc_id, word)
           |SELECT word, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf,
           |       array_to_string(list_sort(list(doc_id)), '|') AS postings
           |FROM tf GROUP BY word ORDER BY word""".stripMargin))

  /** Group-median imputation: plant nulls deterministically
    * (event_id % 11), impute each from its event_type's median of the
    * SURVIVING values (exact interpolated percentile — bit-compatible
    * cross-engine per q103), and report the imputed-vs-raw means. */
  val q111MedianImpute = GQuery(
    "q111_median_impute",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .withColumn("v", when(pmod($"event_id", lit(11)) === 0, lit(null))
          .otherwise($"value"))
      val med = ev.groupBy($"event_type")
        .agg(expr("percentile(v, 0.5D)").as("med"))
      ev.join(broadcast(med), "event_type")
        .withColumn("v_filled", coalesce($"v", $"med"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          count(when($"v".isNull, 1)).as("n_imputed"),
          round(min($"med"), 4).as("median_used"),
          round(avg($"v_filled"), 4).as("filled_mean"))
        .orderBy($"event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type, event_id,
           |         CASE WHEN event_id % 11 = 0 THEN NULL ELSE value END AS v
           |  FROM events),
           |med AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM ev GROUP BY event_type)
           |SELECT event_type, count(*) AS n,
           |       count(*) FILTER (WHERE v IS NULL) AS n_imputed,
           |       round(min(med), 4) AS median_used,
           |       round(avg(COALESCE(v, med)), 4) AS filled_mean
           |FROM ev JOIN med USING (event_type)
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Per-stratum deterministic sampling: each label keeps a
    * (label%3+1)·10% rate via the md5 hash-mod bucket the split/dedup
    * oracles already reproduce bit-for-bit in DuckDB — membership is a
    * pure function of the key, stable under reruns and appends. */
  val q112StratifiedSample = GQuery(
    "q112_stratified_sample",
    (s, d) => {
      import s.implicits._
      val em = Tables.embeddings(s, d)
      val rate = (pmod($"label", lit(3)) + 1) * 10
      em.withColumn("bucket", graft.operators.Sampling.hashBucket($"vec_id", 100))
        .groupBy($"label")
        .agg(
          count(lit(1)).as("n_total"),
          count(when($"bucket" < rate, 1)).as("n_sampled"))
        .withColumn("rate_pct", rate.cast("int"))
        .orderBy($"label")
    },
    Some("""SELECT label, count(*) AS n_total,
           |       count(*) FILTER (WHERE
           |         CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
           |           < (label % 3 + 1) * 10) AS n_sampled,
           |       CAST((label % 3 + 1) * 10 AS INT) AS rate_pct
           |FROM embeddings GROUP BY label ORDER BY label""".stripMargin))

  val all: Seq[GQuery] =
    Seq(q96BloomPrune, q97RepetitionQuality, q98TokenChunks, q99SequencePacking,
      q100Scd2History, q101FuzzyMatch, q102InvertedIndex, q111MedianImpute,
      q112StratifiedSample)
}
