package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.Curation
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators as driver-verifiable queries: sub-document
  * chunk dedup (CCNet-style), PII redaction accounting, benchmark
  * contamination detection, per-domain stats, weighted resampling,
  * vocabulary coverage, and deterministic training order. Every join /
  * shuffle key is an md5-derived 60-bit hash (never raw text), so the
  * DuckDB oracle reproduces each decision bit-for-bit and the 100 TB
  * plan shuffles 8-byte keys.
  */
object CurationQueries {

  /** Shared SQL fragments (one definition repo-wide — see OracleSql —
    * so the two engines cannot drift). */
  private val toksSql = OracleSql.toksSql
  private def h60of(x: String) = OracleSql.h60of(x)

  /** q117 — chunk-level ("line"-level) dedup accounting: split every
    * document into consecutive 10-token chunks, hash each, and measure
    * per-source how much of the corpus is made of passages repeated in
    * more than one document — the CCNet signal for boilerplate
    * removal. The shuffle key is the 60-bit chunk hash; chunk text
    * never leaves the scan stage.
    */
  val q117ChunkDedup = GQuery(
    "q117_chunk_dedup",
    (s, d) => {
      import s.implicits._
      // native stride-10 window hashes ≡ tokenHash60(Curation.chunks)
      // bit-for-bit (NgramNativeSpec) — the declarative twin runs an
      // interpreted md5 chain per chunk inside the HOF lambda
      val ch = Tables.documents(s, d)
        .select($"doc_id", $"source",
          explode(graft.functions.Natives.ngramHashes($"text", 10, 10)).as("ch"))
      // single pass, q150's shape: (ch, doc_id) grain once, then the
      // distinct-doc count per chunk hash is a plain row count over
      // the ch window partition — replaces the countDistinct +
      // join-back that scanned and hashed the corpus twice. One
      // exchange via repartition(ch) serves both the aggregate and
      // the window.
      val perDoc = ch.repartition($"ch")
        .groupBy($"ch", $"doc_id", $"source")
        .agg(count(lit(1)).as("c"))
        .withColumn("nd", count(lit(1)).over(Window.partitionBy($"ch")))
      perDoc.groupBy($"source")
        .agg(
          sum($"c").as("n_chunks"),
          coalesce(sum(when($"nd" > 1, $"c")), lit(0L)).as("n_dup_chunks"),
          round(coalesce(sum(when($"nd" > 1, $"c")), lit(0L)).cast("double") /
            sum($"c").cast("double"), 4).as("dup_frac"))
        .orderBy($"source")
    },
    Some(s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
            |ch AS (
            |  SELECT doc_id, source, ${h60of("chunk")} AS ch FROM (
            |    SELECT doc_id, source,
            |           unnest(CASE WHEN len(t) >= 10
            |             THEN list_transform(range(0, len(t) // 10),
            |                    i -> array_to_string(t[i*10+1:i*10+10], ' '))
            |             ELSE [] END) AS chunk
            |    FROM toks)),
            |cd AS (SELECT ch, count(DISTINCT doc_id) AS n_docs FROM ch GROUP BY ch)
            |SELECT source, count(*) AS n_chunks,
            |       count(*) FILTER (WHERE n_docs > 1) AS n_dup_chunks,
            |       round(CAST(count(*) FILTER (WHERE n_docs > 1) AS DOUBLE) /
            |             CAST(count(*) AS DOUBLE), 4) AS dup_frac
            |FROM ch JOIN cd USING (ch)
            |GROUP BY source ORDER BY source""".stripMargin),
    benchmark = true)

  /** q118 — PII redaction accounting. The corpus carries no PII, so
    * deterministic synthetic PII is injected by doc_id residue (same
    * expression in both engines); the query then counts and redacts
    * emails / phone numbers / IPv4s per source and reports the
    * character volume removed.
    */
  val q118PiiRedaction = GQuery(
    "q118_pii_redaction",
    (s, d) => {
      import s.implicits._
      val aug = Tables.documents(s, d).withColumn("t2", concat($"text",
        when($"doc_id" % 7 === 0,
          concat(lit(" contact user"), $"doc_id".cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when($"doc_id" % 11 === 0, lit(" call 555-0142")).otherwise(lit("")),
        when($"doc_id" % 13 === 0, lit(" from 10.0.0.7 logged")).otherwise(lit(""))))
      aug
        .withColumn("n_email", Curation.countMatches($"t2", Curation.EmailRe))
        .withColumn("n_phone", Curation.countMatches($"t2", Curation.PhoneRe))
        .withColumn("n_ip", Curation.countMatches($"t2", Curation.Ipv4Re))
        .withColumn("removed", length($"t2") - length(Curation.redactPii($"t2")))
        .groupBy($"source")
        .agg(
          sum($"n_email").as("n_email"),
          sum($"n_phone").as("n_phone"),
          sum($"n_ip").as("n_ip"),
          count(when($"n_email" + $"n_phone" + $"n_ip" > 0, 1)).as("n_docs_pii"),
          sum($"removed").as("chars_removed"))
        .orderBy($"source")
    },
    Some(s"""WITH aug AS (
            |  SELECT source,
            |    text ||
            |    CASE WHEN doc_id % 7 = 0
            |         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            |         ELSE '' END ||
            |    CASE WHEN doc_id % 11 = 0 THEN ' call 555-0142' ELSE '' END ||
            |    CASE WHEN doc_id % 13 = 0 THEN ' from 10.0.0.7 logged' ELSE '' END AS t2
            |  FROM documents),
            |scored AS (
            |  SELECT source,
            |    len(regexp_extract_all(t2, '${Curation.EmailRe}')) AS n_email,
            |    len(regexp_extract_all(t2, '${Curation.PhoneRe}')) AS n_phone,
            |    len(regexp_extract_all(t2, '${Curation.Ipv4Re}')) AS n_ip,
            |    length(t2) - length(
            |      regexp_replace(regexp_replace(regexp_replace(t2,
            |        '${Curation.EmailRe}', '<EMAIL>', 'g'),
            |        '${Curation.PhoneRe}', '<PHONE>', 'g'),
            |        '${Curation.Ipv4Re}', '<IP>', 'g')) AS removed
            |  FROM aug)
            |SELECT source,
            |       CAST(sum(n_email) AS BIGINT) AS n_email,
            |       CAST(sum(n_phone) AS BIGINT) AS n_phone,
            |       CAST(sum(n_ip) AS BIGINT) AS n_ip,
            |       count(*) FILTER (WHERE n_email + n_phone + n_ip > 0) AS n_docs_pii,
            |       CAST(sum(removed) AS BIGINT) AS chars_removed
            |FROM scored GROUP BY source ORDER BY source""".stripMargin))

  /** q119 — benchmark contamination: 8-gram overlap between a held-out
    * "benchmark" slice (doc_id < 25) and the training slice (the rest
    * plus planted contaminated copies built from benchmark prefixes).
    * Grams meet on their 60-bit hashes — an equi-join on longs, never
    * an all-pairs text comparison.
    */
  val q119Contamination = GQuery(
    "q119_contamination",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val toks = TextAnalysis.tokens($"text")
      val planted = docs.where($"doc_id" < 25 && $"doc_id" % 5 === 0)
        .select(($"doc_id" + 200000L).as("doc_id"),
          concat(array_join(slice(toks, 1, 12), " "),
            lit(" planted copy segment tail")).as("text"))
      val train = docs.where($"doc_id" >= 25).select($"doc_id", $"text")
        .unionByName(planted)
      def gramHashes(df: DataFrame, id: Column, as: String) =
        df.select(id.as(as), explode(TextAnalysis.shingles($"text", 8)).as("g"))
          .select(col(as), TextAnalysis.tokenHash60($"g").as("gh"))
      val tg = gramHashes(train, $"doc_id", "doc_id")
      val bg = gramHashes(docs.where($"doc_id" < 25), $"doc_id", "bench_id")
      tg.join(bg, "gh")
        .groupBy($"doc_id")
        .agg(countDistinct($"gh").as("n_shared"),
          countDistinct($"bench_id").as("n_bench"))
        .orderBy($"n_shared".desc, $"doc_id")
        .limit(20)
    },
    Some {
      val gram8 = "CASE WHEN len(t) >= 8 THEN list_distinct(list_transform(" +
        "range(0, len(t) - 7), i -> array_to_string(t[i+1:i+8], ' '))) ELSE [] END"
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |planted AS (
         |  SELECT doc_id + 200000 AS doc_id,
         |         array_to_string(t[1:12], ' ') || ' planted copy segment tail' AS text
         |  FROM toks WHERE doc_id < 25 AND doc_id % 5 = 0),
         |train AS (SELECT doc_id, text FROM documents WHERE doc_id >= 25
         |          UNION ALL SELECT doc_id, text FROM planted),
         |tg AS (SELECT doc_id, ${h60of("g")} AS gh FROM (
         |         SELECT doc_id, unnest($gram8) AS g
         |         FROM (SELECT doc_id, $toksSql AS t FROM train))),
         |bg AS (SELECT doc_id AS bench_id, ${h60of("g")} AS gh FROM (
         |         SELECT doc_id, unnest($gram8) AS g
         |         FROM (SELECT doc_id, $toksSql AS t FROM documents WHERE doc_id < 25)))
         |SELECT tg.doc_id, count(DISTINCT tg.gh) AS n_shared,
         |       count(DISTINCT bg.bench_id) AS n_bench
         |FROM tg JOIN bg USING (gh)
         |GROUP BY tg.doc_id
         |ORDER BY n_shared DESC, doc_id LIMIT 20""".stripMargin
    })

  /** q120 — per-domain corpus accounting over normalized URLs (the
    * URLs are synthesized from source+doc_id with the same expression
    * in both engines; the operator under test is extract-and-group).
    */
  val q120DomainStats = GQuery(
    "q120_domain_stats",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("t2", concat($"text", lit(" https://"), $"source",
          lit(".example.com/p/"), $"doc_id".cast("string")))
        .withColumn("domain", Curation.domain($"t2"))
        .groupBy($"domain")
        .agg(count(lit(1)).as("n_docs"),
          round(avg($"n_chars"), 2).as("avg_chars"),
          countDistinct($"lang").as("n_langs"))
        .orderBy($"domain")
    },
    Some("""WITH aug AS (
           |  SELECT lang, n_chars,
           |         regexp_extract(text || ' https://' || source || '.example.com/p/' ||
           |                        CAST(doc_id AS VARCHAR),
           |                        'https?://([A-Za-z0-9.-]+)', 1) AS domain
           |  FROM documents)
           |SELECT domain, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars,
           |       count(DISTINCT lang) AS n_langs
           |FROM aug GROUP BY domain ORDER BY domain""".stripMargin))

  /** q121 — deterministic weighted resampling: each source gets an
    * md5-derived repeat factor in 1..3 and its documents are exploded
    * that many times — the domain-mixing step of a training-data
    * recipe, with no RNG so re-runs (and the oracle) agree exactly.
    */
  val q121WeightedResample = GQuery(
    "q121_weighted_resample",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("w", (TextAnalysis.tokenHash60($"source") % 3 + 1).cast("int"))
        .select($"doc_id", $"source", $"w",
          explode(sequence(lit(1), $"w")).as("rep"))
        .groupBy($"source")
        .agg(min($"w").as("weight"),
          countDistinct($"doc_id").as("n_in"),
          count(lit(1)).as("n_out"))
        .orderBy($"source")
    },
    Some(s"""WITH wts AS (
            |  SELECT doc_id, source,
            |         CAST(${h60of("source")} % 3 + 1 AS INT) AS w
            |  FROM documents),
            |rep AS (SELECT doc_id, source, w, unnest(range(1, w + 1)) AS r FROM wts)
            |SELECT source, min(w) AS weight, count(DISTINCT doc_id) AS n_in,
            |       count(*) AS n_out
            |FROM rep GROUP BY source ORDER BY source""".stripMargin))

  /** q122 — vocabulary coverage: global term counts, top-1000 terms by
    * (count, word), cumulative share of all token occurrences. The
    * running-sum window runs AFTER the top-K cut, so it orders a
    * constant ≤1000 rows regardless of corpus size (never a global
    * window over the vocabulary).
    */
  val q122VocabCoverage = GQuery(
    "q122_vocab_coverage",
    (s, d) => {
      import s.implicits._
      val tf = Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens($"text")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
      val total = tf.agg(sum($"cnt").as("total"))
      val top = tf.orderBy($"cnt".desc, $"word").limit(1000)
      val w = Window.orderBy($"cnt".desc, $"word")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.withColumn("cum", sum($"cnt").over(w))
        .crossJoin(broadcast(total))
        .select($"word", $"cnt",
          round($"cum".cast("double") / $"total".cast("double"), 6).as("cum_share"))
        .orderBy($"cnt".desc, $"word")
        .limit(30)
    },
    Some(s"""WITH tf AS (
            |  SELECT word, count(*) AS cnt FROM (
            |    SELECT unnest($toksSql) AS word FROM documents)
            |  GROUP BY word),
            |total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM tf),
            |top AS (SELECT word, cnt FROM tf ORDER BY cnt DESC, word LIMIT 1000),
            |c AS (SELECT word, cnt,
            |        CAST(sum(cnt) OVER (ORDER BY cnt DESC, word
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            |      FROM top)
            |SELECT word, cnt, round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6) AS cum_share
            |FROM c CROSS JOIN total
            |ORDER BY cnt DESC, word LIMIT 30""".stripMargin))

  /** q123 — deterministic training order: docs are hashed into 32
    * shards and ordered within each shard by hash — a reproducible
    * global shuffle whose windows are shard-partitioned (each shard
    * sorts 1/32 of the data; no global ordering anywhere).
    */
  val q123TrainingOrder = GQuery(
    "q123_training_order",
    (s, d) => {
      import s.implicits._
      val h = TextAnalysis.tokenHash60($"doc_id".cast("string"))
      val sharded = Tables.documents(s, d)
        .select($"doc_id", (h % 32).cast("int").as("shard"), h.as("h"))
      val w = Window.partitionBy($"shard").orderBy($"h", $"doc_id")
      sharded.withColumn("rn", row_number().over(w))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"),
          min(when($"rn" === 1, $"doc_id")).as("first_doc"))
        .orderBy($"shard")
    },
    Some(s"""WITH sh AS (
            |  SELECT doc_id, CAST(h % 32 AS INT) AS shard, h FROM (
            |    SELECT doc_id, ${h60of("CAST(doc_id AS VARCHAR)")} AS h FROM documents)),
            |r AS (SELECT doc_id, shard,
            |        row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
            |      FROM sh)
            |SELECT shard, count(*) AS n_docs,
            |       min(doc_id) FILTER (WHERE rn = 1) AS first_doc
            |FROM r GROUP BY shard ORDER BY shard""".stripMargin))

  /** q135 — bigram language-model quality scoring: corpus-wide bigram
    * and left-context counts train an add-one-smoothed LM, then each
    * document is scored by its mean log P(w_i | w_{i−1}) — the
    * perplexity-style fluency signal of a training-data pipeline
    * (documents full of never-seen-elsewhere token transitions score
    * low). Count tables join back on 60-bit hashes, so the hot joins
    * shuffle 8-byte keys; at 100 TB the bigram-count table is the only
    * large intermediate and it's pre-aggregated before the join.
    */
  val q135BigramLm = GQuery(
    "q135_bigram_lm",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      // native positional hashes: bigram hash bh_i pairs with its
      // LEFT-context unigram hash lh_i = uni[i] for i = 1..len-1, so
      // zip bi (len-1 hashes) with uni cut to the same length —
      // bit-identical to the element_at/tokenHash60 form
      // (NgramNativeSpec) without the per-position interpreted md5
      val big = docs
        .select($"doc_id", $"source",
          graft.functions.Natives.ngramHashes($"text", 1, 1).as("uni"),
          graft.functions.Natives.ngramHashes($"text", 2, 1).as("bi"))
        .where(size($"bi") >= 1)
        .withColumn("uni_cut", slice($"uni", lit(1), size($"bi")))
        .select($"doc_id", $"source",
          explode(arrays_zip($"uni_cut", $"bi")).as("z"))
        .select($"doc_id", $"source",
          $"z.uni_cut".as("lh"), $"z.bi".as("bh"))
        // materialized once (lazy): the position stream feeds the
        // count pass AND the probe — without this the probe re-ran the
        // scan→ngram-hash→explode lineage a second time (the narrow
        // 4-column stream is the cheap thing to hold; the tokenize is
        // the expensive thing to repeat)
        .localCheckpoint(false)
      // ONE (bh, lh)-keyed count pass feeds BOTH count tables: bh and
      // lh ride the same row, so cb = Σ c over lh and cl = Σ c over bh
      // from the distinct-bigram table are the identical per-key
      // totals, while the raw position stream is scanned twice (count
      // + probe) instead of three times. The two roll-ups share the
      // composite exchange via ReusedExchange (identical subtree), and
      // the probe keeps the original broadcast-join shape — the
      // planner, not a hint, still decides from the tables' sizes
      // (plans/r16/q135_bigram_lm_*.txt).
      val counts = big.groupBy($"bh", $"lh").agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val cb = counts.groupBy($"bh").agg(sum($"c").as("cb"))
      val cl = counts.groupBy($"lh").agg(sum($"c").as("cl"))
      val vocab = docs.select(explode(TextAnalysis.tokens($"text")).as("w"))
        .agg(countDistinct($"w").as("vocab"))
      val docScores = big.join(cb, "bh").join(cl, "lh")
        .crossJoin(broadcast(vocab))
        .withColumn("lp", log(($"cb".cast("double") + 1.0) /
          ($"cl".cast("double") + $"vocab".cast("double"))))
        .groupBy($"source", $"doc_id")
        .agg(avg($"lp").as("dlp"))
      docScores.groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg($"dlp"), 6).as("avg_logp"),
          round(min($"dlp"), 6).as("worst_logp"))
        .orderBy($"source")
    },
    Some(s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
            |tt AS (SELECT doc_id, source, t FROM toks WHERE len(t) >= 2),
            |big AS (
            |  SELECT doc_id, source,
            |         ${h60of("t[i]")} AS lh,
            |         ${h60of("t[i] || ' ' || t[i+1]")} AS bh
            |  FROM (SELECT doc_id, source, t, unnest(range(1, len(t))) AS i FROM tt)),
            |cb AS (SELECT bh, count(*) AS cb FROM big GROUP BY bh),
            |cl AS (SELECT lh, count(*) AS cl FROM big GROUP BY lh),
            |v AS (SELECT count(DISTINCT w) AS vocab FROM
            |        (SELECT unnest($toksSql) AS w FROM documents)),
            |ds AS (
            |  SELECT source, doc_id,
            |         avg(ln((CAST(cb AS DOUBLE) + 1.0) /
            |                (CAST(cl AS DOUBLE) + CAST(vocab AS DOUBLE)))) AS dlp
            |  FROM big JOIN cb USING (bh) JOIN cl USING (lh) CROSS JOIN v
            |  GROUP BY source, doc_id)
            |SELECT source, count(*) AS n_docs,
            |       round(avg(dlp), 6) AS avg_logp,
            |       round(min(dlp), 6) AS worst_logp
            |FROM ds GROUP BY source ORDER BY source""".stripMargin),
    benchmark = true)

  /** q150 — sliding duplicated-span detection (the exact-substring
    * dedup signal of Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): every overlapping 8-token window
    * is hashed, and a position is "duplicated" when its window text
    * recurs in another document. Unlike q117's disjoint chunks this
    * catches SHIFTED copies (quote + one-word prefix). Shuffle key is
    * the 60-bit window hash; window text never leaves the scan stage.
    * At 100 TB the gram-count table is the one large intermediate and
    * it's pre-aggregated (countDistinct partial) before the join back.
    */
  val q150DupNgrams = GQuery(
    "q150_dup_ngrams",
    (s, d) => {
      import s.implicits._
      // native sliding-window hashes ≡ the declarative
      // transform(sequence)/tokenHash60 form bit-for-bit
      // (NgramNativeSpec); docs with < 8 tokens yield an empty array,
      // which explode drops — same rows as a size(t) >= 8 filter
      val grams = Tables.documents(s, d).select($"doc_id", $"source",
        explode(graft.functions.Natives.ngramHashes($"text", 8, 1)).as("gh"))
      // Single pass: the count-distinct + join-back form scanned and
      // hashed the corpus twice and shuffled the raw position stream
      // twice (plans/r16/q150_dup_ngrams_before.txt). Aggregating to
      // (gh, doc_id) grain first — positions per doc per window hash —
      // makes nd a plain count of rows over the gh window partition
      // (exactly countDistinct(doc_id) per gh, no join back), and the
      // per-source totals are the same sums of per-position counts.
      // repartition by gh alone so the (gh, doc_id, source) aggregate
      // AND the gh window both run off ONE exchange (hash(gh) clusters
      // both); without it each keys its own shuffle
      val perDoc = grams.repartition($"gh")
        .groupBy($"gh", $"doc_id", $"source")
        .agg(count(lit(1)).as("c"))
        .withColumn("nd", count(lit(1)).over(Window.partitionBy($"gh")))
      perDoc.groupBy($"source")
        .agg(sum($"c").as("n_pos"),
          coalesce(sum(when($"nd" > 1, $"c")), lit(0L)).as("n_dup_pos"),
          round(coalesce(sum(when($"nd" > 1, $"c")), lit(0L)).cast("double") /
            sum($"c").cast("double"), 4).as("dup_frac"))
        .orderBy($"source")
    },
    Some(s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
            |tt AS (SELECT doc_id, source, t FROM toks WHERE len(t) >= 8),
            |g AS (
            |  SELECT doc_id, source,
            |         ${h60of("array_to_string(t[i+1:i+8], ' ')")} AS gh
            |  FROM (SELECT doc_id, source, t, unnest(range(0, len(t) - 7)) AS i FROM tt)),
            |c AS (SELECT gh, count(DISTINCT doc_id) AS nd FROM g GROUP BY gh)
            |SELECT source, count(*) AS n_pos,
            |       count(*) FILTER (WHERE nd > 1) AS n_dup_pos,
            |       round(CAST(count(*) FILTER (WHERE nd > 1) AS DOUBLE) /
            |             CAST(count(*) AS DOUBLE), 4) AS dup_frac
            |FROM g JOIN c USING (gh)
            |GROUP BY source ORDER BY source""".stripMargin),
    benchmark = true)

  /** q151 — adaptive per-language quality gate: instead of one global
    * threshold, each language keeps documents above its OWN 30th
    * quality percentile — the standard fix for quality filters that
    * would otherwise starve low-resource languages. Thresholds are a
    * tiny per-group table (broadcast); quantiles are 6dp-quantized
    * before the comparison (q145 recipe) so both engines apply the
    * identical cut.
    */
  val q151AdaptiveQuality = GQuery(
    "q151_adaptive_quality",
    (s, d) => {
      import s.implicits._
      val scored = Tables.documents(s, d)
        .select($"lang", TextAnalysis.qualityScore($"text").as("q"))
      val thr = scored.groupBy($"lang")
        .agg(round(expr("percentile(q, 0.3D)"), 6).as("thr"))
      scored.join(broadcast(thr), "lang")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          count(when($"q" >= $"thr", 1)).as("n_kept"),
          round(count(when($"q" >= $"thr", 1)).cast("double") /
            count(lit(1)).cast("double"), 4).as("kept_frac"),
          round(avg(when($"q" >= $"thr", $"q")), 4).as("avg_q_kept"))
        .orderBy($"lang")
    },
    Some(s"""WITH scored AS (
            |  SELECT lang, round(
            |    0.4 * (len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE))
            |    + 0.3 * least(5.0 * (len(list_filter(toks, x -> lower(x) IN (${TextAnalysis.Stopwords.map("'" + _ + "'").mkString(",")}))) / CAST(len(toks) AS DOUBLE)), 1.0)
            |    + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0), 4) AS q
            |  FROM (SELECT lang, $toksSql AS toks FROM documents)),
            |thr AS (SELECT lang, round(quantile_cont(q, 0.3), 6) AS thr
            |        FROM scored GROUP BY lang)
            |SELECT lang, count(*) AS n_docs,
            |       count(*) FILTER (WHERE q >= thr) AS n_kept,
            |       round(CAST(count(*) FILTER (WHERE q >= thr) AS DOUBLE) /
            |             CAST(count(*) AS DOUBLE), 4) AS kept_frac,
            |       round(avg(q) FILTER (WHERE q >= thr), 4) AS avg_q_kept
            |FROM scored JOIN thr USING (lang)
            |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q152 — BPE merge-pair statistics (the counting kernel of
    * tokenizer TRAINING): lowercase word frequencies, then every
    * adjacent character pair weighted by its word's corpus frequency;
    * the top pair is what the next BPE merge would fuse. Two shuffles,
    * both pre-aggregated map-side (word counts, then pair sums); the
    * per-word char-pair explode runs on the already-deduplicated word
    * table, so cost scales with |vocab|, not corpus size. Top-20 is
    * fully tie-broken (count desc, pair asc) for determinism.
    */
  val q152BpePairs = GQuery(
    "q152_bpe_pairs",
    (s, d) => {
      import s.implicits._
      val words = Tables.documents(s, d)
        .select(explode(transform(TextAnalysis.tokens($"text"), lower(_))).as("w"))
        .groupBy($"w").agg(count(lit(1)).as("wc"))
        .where(length($"w") >= 2)
      words
        .select($"wc", explode(transform(sequence(lit(1), length($"w") - 1),
          i => $"w".substr(i, lit(2)))).as("pair"))
        .groupBy($"pair").agg(sum($"wc").as("n"))
        .orderBy($"n".desc, $"pair".asc)
        .limit(20)
    },
    Some(s"""WITH w AS (
            |  SELECT unnest(list_transform($toksSql, x -> lower(x))) AS w
            |  FROM documents),
            |wc AS (SELECT w, count(*) AS wc FROM w GROUP BY w),
            |p AS (
            |  SELECT substring(w, i, 2) AS pair, wc
            |  FROM (SELECT w, wc, unnest(range(1, length(w))) AS i
            |        FROM wc WHERE length(w) >= 2))
            |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
            |FROM p GROUP BY pair
            |ORDER BY n DESC, pair LIMIT 20""".stripMargin))

  /** q169 — data mixing to a token budget: the mixture-weights step of
    * training-data prep. Each source gets a recipe weight (derived
    * from its name so the recipe survives scale factors), the corpus
    * budget is 60% of total tokens, and each source's keep-rate is
    * min(1, target/have) — oversubscribed sources downsample by a
    * deterministic per-doc hash coin, underfull sources keep
    * everything (their deficit is the "epochs>1" signal a real recipe
    * would log). The rate is 6dp-quantized and the hash threshold is
    * floor(rate·2⁶⁰), so both engines flip identical coins; the audit
    * reports achieved vs target per source.
    */
  val q169DataMixing = GQuery(
    "q169_data_mixing",
    (s, d) => {
      import s.implicits._
      val two60 = math.pow(2, 60)
      val docs = Tables.documents(s, d)
        .select($"doc_id", $"source", TextAnalysis.tokenCount($"text").as("toks"))
      val w = when(regexp_extract($"source", "[0-9]+", 0).cast("int") % 2 === 0, 1.0)
        .otherwise(0.3)
      val have = docs.groupBy($"source")
        .agg(sum($"toks").as("have")).withColumn("w", w)
      val scale = have.agg(
        sum($"w").as("sum_w"), sum($"have").as("total_toks"))
      val rates = have.crossJoin(broadcast(scale))
        .withColumn("target",
          $"w" / $"sum_w" * (lit(0.6) * $"total_toks".cast("double")))
        .withColumn("rate",
          round(least(lit(1.0), $"target" / $"have".cast("double")), 6))
        .select($"source", $"have", $"target", $"rate")
      docs.join(broadcast(rates), "source")
        .withColumn("u", TextAnalysis.tokenHash60(
          concat($"doc_id".cast("string"), lit(":mix"))))
        .withColumn("kept", $"u" < floor($"rate" * two60).cast("bigint"))
        .groupBy($"source")
        .agg(first($"have").as("have_toks"),
          round(first($"target"), 2).as("target_toks"),
          count(when($"kept", 1)).as("n_kept"),
          coalesce(sum(when($"kept", $"toks")), lit(0L)).as("kept_toks"),
          round(coalesce(sum(when($"kept", $"toks")), lit(0L)).cast("double") /
            first($"target"), 4).as("achieved_ratio"))
        .orderBy($"source")
    },
    Some(s"""WITH docs AS (
            |  SELECT doc_id, source, len($toksSql) AS toks FROM documents),
            |have AS (
            |  SELECT source, CAST(sum(toks) AS BIGINT) AS have,
            |         CASE WHEN CAST(regexp_extract(source, '[0-9]+') AS INT) % 2 = 0
            |              THEN 1.0 ELSE 0.3 END AS w
            |  FROM docs GROUP BY source),
            |scale AS (SELECT sum(w) AS sum_w, CAST(sum(have) AS BIGINT) AS total_toks FROM have),
            |rates AS (
            |  SELECT source, have,
            |         w / sum_w * (0.6 * CAST(total_toks AS DOUBLE)) AS target,
            |         round(least(1.0, (w / sum_w * (0.6 * CAST(total_toks AS DOUBLE)))
            |               / CAST(have AS DOUBLE)), 6) AS rate
            |  FROM have CROSS JOIN scale)
            |SELECT d.source, any_value(have) AS have_toks,
            |       round(any_value(target), 2) AS target_toks,
            |       count(*) FILTER (WHERE kept) AS n_kept,
            |       CAST(COALESCE(sum(toks) FILTER (WHERE kept), 0) AS BIGINT) AS kept_toks,
            |       round(CAST(COALESCE(sum(toks) FILTER (WHERE kept), 0) AS DOUBLE)
            |             / any_value(target), 4) AS achieved_ratio
            |FROM (
            |  SELECT docs.source, toks, have, target,
            |         ${h60of("doc_id || ':mix'")} <
            |           CAST(floor(rate * 1152921504606846976.0) AS BIGINT) AS kept
            |  FROM docs JOIN rates ON docs.source = rates.source) d
            |GROUP BY d.source ORDER BY d.source""".stripMargin))

  /** q172 — corpus release (the capstone composition): exact dedup
    * (keep-min-id per fingerprint, Dedup.exact) → adaptive per-language
    * quality gate (30th-percentile thresholds, q151) → per-source
    * release accounting (docs surviving each stage + final token
    * volume). This is the end-to-end shape a training-data release
    * actually runs; every stage is an operator the registry already
    * proves in isolation, and the oracle recomputes the whole chain,
    * so the green row is the COMPOSITION proof. Underfull sources
    * survive as zero-rows via left joins, not dropped.
    */
  val q172CorpusRelease = GQuery(
    "q172_corpus_release",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      // Score AT THE SCAN, then dedup over narrow rows: the old form
      // (Dedup.exact first, score survivors) shipped FULL TEXT through
      // the fingerprint exchange and sorted text-bearing rows in the
      // window — the guide-§8 anti-pattern of shuffling payloads to
      // make a decision that needs only metadata. Here every row is
      // scored scan-side (parallel column math, no shuffle), so the
      // exchange + window sort carry (fp, doc_id, source, lang, q,
      // toks) only. Trade: duplicates are scored too — the dup factor
      // here is ~0.2% (5000→4992 distinct at sf0.1, 50000→49920 at
      // sf1); even at web-corpus dup factors the scan-side CPU is the
      // cheap side vs text through a shuffle. Survivor choice (min
      // doc_id per fingerprint) and per-survivor q/toks are computed
      // from the same expressions on the same rows — values identical.
      // The narrow survivor table is still lazily materialized once for
      // its three consumers (threshold agg, gate probe, dedup counts;
      // plans/r16/q172_corpus_release_before.txt shows the tripled
      // lineage this prevents).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"__fp").orderBy($"doc_id")
      val scored = docs
        .select($"doc_id", $"source", $"lang",
          TextAnalysis.qualityScore($"text").as("q"),
          TextAnalysis.tokenCount($"text").as("toks"),
          TextAnalysis.fingerprint($"text").as("__fp"))
        .withColumn("__rn", row_number().over(w)).filter($"__rn" === 1)
        .select($"source", $"lang", $"q", $"toks")
        .localCheckpoint(false)
      val thr = scored.groupBy($"lang")
        .agg(round(expr("percentile(q, 0.3D)"), 6).as("thr"))
      val gated = scored.join(broadcast(thr), "lang").where($"q" >= $"thr")
      val raw = docs.groupBy($"source").agg(count(lit(1)).as("n_raw"))
      val dd = scored.groupBy($"source").agg(count(lit(1)).as("n_dedup"))
      val fin = gated.groupBy($"source")
        .agg(count(lit(1)).as("n_final"), sum($"toks").as("tokens_final"))
      raw.join(dd, Seq("source"), "left").join(fin, Seq("source"), "left")
        .select($"source", $"n_raw",
          coalesce($"n_dedup", lit(0L)).as("n_dedup"),
          coalesce($"n_final", lit(0L)).as("n_final"),
          coalesce($"tokens_final", lit(0L)).as("tokens_final"))
        .orderBy($"source")
    },
    Some(s"""WITH ranked AS (
            |  SELECT *, row_number() OVER (
            |    PARTITION BY md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
            |    ORDER BY doc_id) AS rn
            |  FROM documents),
            |dedup AS (SELECT * FROM ranked WHERE rn = 1),
            |scored AS (
            |  SELECT source, lang, len(toks) AS toks, round(
            |    0.4 * (len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE))
            |    + 0.3 * least(5.0 * (len(list_filter(toks, x -> lower(x) IN (${TextAnalysis.Stopwords.map("'" + _ + "'").mkString(",")}))) / CAST(len(toks) AS DOUBLE)), 1.0)
            |    + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0), 4) AS q
            |  FROM (SELECT source, lang, $toksSql AS toks FROM dedup)),
            |thr AS (SELECT lang, round(quantile_cont(q, 0.3), 6) AS thr
            |        FROM scored GROUP BY lang),
            |gated AS (SELECT scored.* FROM scored JOIN thr USING (lang)
            |          WHERE q >= thr),
            |raw AS (SELECT source, count(*) AS n_raw FROM documents GROUP BY source),
            |dd AS (SELECT source, count(*) AS n_dedup FROM dedup GROUP BY source),
            |fin AS (SELECT source, count(*) AS n_final,
            |               CAST(sum(toks) AS BIGINT) AS tokens_final
            |        FROM gated GROUP BY source)
            |SELECT raw.source, n_raw,
            |       COALESCE(n_dedup, 0) AS n_dedup,
            |       COALESCE(n_final, 0) AS n_final,
            |       COALESCE(tokens_final, 0) AS tokens_final
            |FROM raw LEFT JOIN dd USING (source) LEFT JOIN fin USING (source)
            |ORDER BY raw.source""".stripMargin),
    benchmark = true)

  /** q173 — lexical overlap matrix: vocabulary Jaccard between every
    * source pair — the LEXICAL complement of q157's embedding-centroid
    * drift. Per-source distinct token-hash sets self-join on the
    * 60-bit hash (the only shuffle key); pair union sizes come from
    * inclusion-exclusion over broadcast per-source vocab sizes, so
    * nothing corpus-sized is ever paired. Top-15 most-overlapping
    * pairs, fully tie-broken.
    */
  val q173VocabOverlap = GQuery(
    "q173_vocab_overlap",
    (s, d) => {
      import s.implicits._
      val st = Tables.documents(s, d)
        .select($"source", explode(TextAnalysis.tokens($"text")).as("w"))
        .select($"source", TextAnalysis.tokenHash60($"w").as("th"))
        .distinct()
      val sizes = st.groupBy($"source").agg(count(lit(1)).as("vsz"))
      val inter = st.select($"source".as("sa"), $"th")
        .join(st.select($"source".as("sb"), $"th"), "th")
        .where($"sa" < $"sb")
        .groupBy($"sa", $"sb").agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sizes.select($"source".as("sa"), $"vsz".as("va"))), "sa")
        .join(broadcast(sizes.select($"source".as("sb"), $"vsz".as("vb"))), "sb")
        .select($"sa", $"sb",
          round($"inter".cast("double") /
            ($"va" + $"vb" - $"inter").cast("double"), 4).as("jaccard"))
        .orderBy($"jaccard".desc, $"sa", $"sb")
        .limit(15)
    },
    Some(s"""WITH st AS (
            |  SELECT DISTINCT source, ${h60of("w")} AS th
            |  FROM (SELECT source, unnest($toksSql) AS w FROM documents)),
            |sizes AS (SELECT source, count(*) AS vsz FROM st GROUP BY source),
            |inter AS (
            |  SELECT a.source AS sa, b.source AS sb, count(*) AS inter
            |  FROM st a JOIN st b ON a.th = b.th AND a.source < b.source
            |  GROUP BY sa, sb)
            |SELECT sa, sb,
            |       round(CAST(inter AS DOUBLE) /
            |             CAST(va.vsz + vb.vsz - inter AS DOUBLE), 4) AS jaccard
            |FROM inter
            |JOIN sizes va ON inter.sa = va.source
            |JOIN sizes vb ON inter.sb = vb.source
            |ORDER BY jaccard DESC, sa, sb LIMIT 15""".stripMargin))

  /** q182 — CCNet-style perplexity bucketing (Wenzek et al. 2020): the
    * q135 bigram LM scores every document, then PER-LANGUAGE exact
    * 33/67-percentile thresholds split the corpus into head / middle /
    * tail quality bands — the gate a pretraining pipeline actually
    * applies (keep head, subsample middle, drop tail), not just the
    * score. Work stays in log space (mean log-prob is monotone in
    * perplexity, so the buckets are identical and no cross-engine
    * `exp` parity is risked); per-doc scores are rounded to 6 dp
    * BEFORE the quantile so both engines interpolate thresholds over
    * identical doubles. Thresholds broadcast back (10 rows); the only
    * large intermediates are the pre-aggregated count tables on 8-byte
    * hash keys, as in q135. */
  val q182PplBuckets = GQuery(
    "q182_ppl_buckets",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val big = docs
        .select($"doc_id", $"lang",
          graft.functions.Natives.ngramHashes($"text", 1, 1).as("uni"),
          graft.functions.Natives.ngramHashes($"text", 2, 1).as("bi"))
        .where(size($"bi") >= 1)
        .withColumn("uni_cut", slice($"uni", lit(1), size($"bi")))
        .select($"doc_id", $"lang", explode(arrays_zip($"uni_cut", $"bi")).as("z"))
        .select($"doc_id", $"lang", $"z.uni_cut".as("lh"), $"z.bi".as("bh"))
      val cb = big.groupBy($"bh").agg(count(lit(1)).as("cb"))
      val cl = big.groupBy($"lh").agg(count(lit(1)).as("cl"))
      val vocab = docs.select(explode(TextAnalysis.tokens($"text")).as("w"))
        .agg(countDistinct($"w").as("vocab"))
      val ds = big.join(cb, "bh").join(cl, "lh").crossJoin(broadcast(vocab))
        .withColumn("lp", log(($"cb".cast("double") + 1.0) /
          ($"cl".cast("double") + $"vocab".cast("double"))))
        .groupBy($"lang", $"doc_id")
        .agg(round(avg($"lp"), 6).as("dlp"))
      val th = ds.groupBy($"lang").agg(
        expr("percentile(dlp, 0.33D)").as("t33"),
        expr("percentile(dlp, 0.67D)").as("t67"))
      ds.join(broadcast(th), "lang")
        .withColumn("bucket",
          when($"dlp" >= $"t67", lit("head"))
            .when($"dlp" >= $"t33", lit("middle"))
            .otherwise(lit("tail")))
        .groupBy($"lang", $"bucket")
        .agg(count(lit(1)).as("n_docs"), round(avg($"dlp"), 4).as("avg_dlp"))
        .orderBy($"lang", $"bucket")
    },
    Some(s"""WITH toks AS (SELECT doc_id, lang, $toksSql AS t FROM documents),
            |tt AS (SELECT doc_id, lang, t FROM toks WHERE len(t) >= 2),
            |big AS (
            |  SELECT doc_id, lang,
            |         ${h60of("t[i]")} AS lh,
            |         ${h60of("t[i] || ' ' || t[i+1]")} AS bh
            |  FROM (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i FROM tt)),
            |cb AS (SELECT bh, count(*) AS cb FROM big GROUP BY bh),
            |cl AS (SELECT lh, count(*) AS cl FROM big GROUP BY lh),
            |v AS (SELECT count(DISTINCT w) AS vocab FROM
            |        (SELECT unnest($toksSql) AS w FROM documents)),
            |ds AS (
            |  SELECT lang, doc_id,
            |         round(avg(ln((CAST(cb AS DOUBLE) + 1.0) /
            |                      (CAST(cl AS DOUBLE) + CAST(vocab AS DOUBLE)))), 6) AS dlp
            |  FROM big JOIN cb USING (bh) JOIN cl USING (lh) CROSS JOIN v
            |  GROUP BY lang, doc_id),
            |th AS (SELECT lang, quantile_cont(dlp, 0.33) AS t33,
            |              quantile_cont(dlp, 0.67) AS t67
            |       FROM ds GROUP BY lang)
            |SELECT lang,
            |  CASE WHEN dlp >= t67 THEN 'head'
            |       WHEN dlp >= t33 THEN 'middle' ELSE 'tail' END AS bucket,
            |  count(*) AS n_docs, round(avg(dlp), 4) AS avg_dlp
            |FROM ds JOIN th USING (lang)
            |GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin))

  /** q185 — linear classifier quality gate (the "model-based filter"
    * tier of a CCNet/fastText-style pipeline, complementing q36's
    * heuristics and q182's LM): score(doc) = mean over tokens of a
    * hashed weight-table lookup w(token) — exactly how a trained
    * linear text classifier applies at scale (hash the token, index a
    * weight vector, average; no vocabulary join). Weights here are the
    * deterministic md5-derived stand-in (trained weights would load as
    * a broadcast table into the same plan shape); scores round to 6 dp
    * before the keep-threshold so both engines gate identical doubles.
    * Shuffle profile: tokens never leave the scan — the per-doc
    * aggregation shuffles (doc_id, partial sums) only. */
  val q185ClassifierGate = GQuery(
    "q185_classifier_gate",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val scored = docs
        .select($"doc_id", $"lang", explode(TextAnalysis.tokens($"text")).as("w"))
        .withColumn("wt",
          (TextAnalysis.tokenHash60($"w") % 1000003L).cast("double") / 1000003.0 - 0.5)
        .groupBy($"lang", $"doc_id")
        .agg(round(avg($"wt"), 6).as("score"))
      scored.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg($"score"), 6).as("avg_score"),
          count(when($"score" >= 0.0, 1)).as("n_kept"))
        .orderBy($"lang")
    },
    Some(s"""WITH toks AS (SELECT doc_id, lang, unnest($toksSql) AS w FROM documents),
            |ds AS (SELECT lang, doc_id,
            |         round(avg(CAST(${h60of("w")} % 1000003 AS DOUBLE) / 1000003.0 - 0.5), 6)
            |           AS score
            |       FROM toks GROUP BY lang, doc_id)
            |SELECT lang, count(*) AS n_docs,
            |       round(avg(score), 6) AS avg_score,
            |       count(*) FILTER (WHERE score >= 0.0) AS n_kept
            |FROM ds GROUP BY lang ORDER BY lang""".stripMargin))

  /** q187 — classifier calibration audit (reliability bins + expected
    * calibration error): q185 GATES on classifier scores; this audits
    * whether those scores can be trusted as probabilities — the check
    * a pipeline runs before it lets a model-based filter drop corpus
    * mass. conf = score + 0.5 maps the linear score to [0,1]; the
    * reference label is a deterministic hash-noised decision correlated
    * with the score (a trained classifier's eval labels would load
    * into the same plan shape). Ten confidence deciles; per-bin mean
    * confidence vs empirical positive rate, |gap|, and the n-weighted
    * ECE attached to every row via a 1-row broadcast cross join.
    * Shuffle profile: per-doc score shuffles (doc_id, partial sums)
    * off the token scan; bins are a 10-row aggregate; ECE is a
    * single-row broadcast — nothing wide moves.
    */
  val q187Calibration = GQuery(
    "q187_calibration",
    (s, d) => {
      import s.implicits._
      val scored = Tables.documents(s, d)
        .select($"doc_id", explode(TextAnalysis.tokens($"text")).as("w"))
        .withColumn("wt",
          (TextAnalysis.tokenHash60($"w") % 1000003L).cast("double") / 1000003.0 - 0.5)
        .groupBy($"doc_id")
        .agg(round(avg($"wt"), 6).as("score"))
      val lab = scored
        .withColumn("conf", $"score" + 0.5)
        .withColumn("noise",
          (TextAnalysis.tokenHash60($"doc_id".cast("string")) % 1000003L)
            .cast("double") / 1000003.0 - 0.5)
        .withColumn("label", when($"score" + lit(0.3) * $"noise" >= 0, 1).otherwise(0))
      val bins = lab
        .withColumn("bin", least(floor($"conf" * 10), lit(9L)))
        .groupBy($"bin")
        .agg(count(lit(1)).as("n_docs"),
          round(avg($"conf"), 6).as("avg_conf"),
          round(avg($"label".cast("double")), 6).as("pos_rate"))
        .withColumn("gap", round(abs($"avg_conf" - $"pos_rate"), 6))
      val ece = bins.agg(
        round(sum($"n_docs" * $"gap") / sum($"n_docs").cast("double"), 6).as("ece"))
      bins.crossJoin(broadcast(ece))
        .select($"bin", $"n_docs", $"avg_conf", $"pos_rate", $"gap", $"ece")
        .orderBy($"bin")
    },
    Some(s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
            |ds AS (SELECT doc_id,
            |         round(avg(CAST(${h60of("w")} % 1000003 AS DOUBLE) / 1000003.0 - 0.5), 6)
            |           AS score
            |       FROM toks GROUP BY doc_id),
            |lab AS (SELECT doc_id, score + 0.5 AS conf,
            |          CASE WHEN score + 0.3 *
            |            (CAST(${h60of("CAST(doc_id AS VARCHAR)")} % 1000003 AS DOUBLE)
            |             / 1000003.0 - 0.5) >= 0 THEN 1 ELSE 0 END AS label
            |        FROM ds),
            |bins AS (SELECT LEAST(CAST(floor(conf * 10) AS BIGINT), 9) AS bin,
            |                count(*) AS n_docs,
            |                round(avg(conf), 6) AS avg_conf,
            |                round(avg(CAST(label AS DOUBLE)), 6) AS pos_rate
            |         FROM lab GROUP BY 1),
            |bg AS (SELECT bin, n_docs, avg_conf, pos_rate,
            |              round(abs(avg_conf - pos_rate), 6) AS gap FROM bins),
            |e AS (SELECT round(sum(n_docs * gap) / CAST(sum(n_docs) AS DOUBLE), 6) AS ece
            |      FROM bg)
            |SELECT bin, n_docs, avg_conf, pos_rate, gap, ece
            |FROM bg CROSS JOIN e ORDER BY bin""".stripMargin))

  /** q188 — padding-waste audit for length-bucketed batch construction:
    * the op a training-data pipeline runs when choosing batching
    * strategy. Documents fall into 64-token length buckets (the
    * dynamic-batching bucket plan); per bucket, the tokens wasted by
    * padding every member to the bucket cap, vs the single-row naive
    * figure (pad everything to the global max — one global batch
    * shape). Length is computed in the scan stage; only (bucket,
    * partial count/sum) shuffles, and the global aggregate is a 1-row
    * broadcast cross join.
    */
  val q188PaddingWaste = GQuery(
    "q188_padding_waste",
    (s, d) => {
      import s.implicits._
      val lens = Tables.documents(s, d)
        .select($"doc_id", size(TextAnalysis.tokens($"text")).cast("long").as("tok_len"))
      val bins = lens
        .withColumn("bucket", floor($"tok_len" / lit(64)))
        .withColumn("cap", ($"bucket" + 1) * 64)
        .groupBy($"bucket", $"cap")
        .agg(count(lit(1)).as("n_docs"), sum($"tok_len").as("sum_tokens"))
        .withColumn("padded_tokens", $"n_docs" * $"cap")
        .withColumn("waste_pct",
          round(($"padded_tokens" - $"sum_tokens").cast("double") /
            $"padded_tokens".cast("double") * 100, 4))
      val naive = lens.agg(
        (count(lit(1)) * max($"tok_len")).as("np"), sum($"tok_len").as("st"))
        .select(round(($"np" - $"st").cast("double") /
          $"np".cast("double") * 100, 4).as("naive_waste_pct"))
      bins.crossJoin(broadcast(naive))
        .select($"bucket", $"cap", $"n_docs", $"sum_tokens", $"padded_tokens",
          $"waste_pct", $"naive_waste_pct")
        .orderBy($"bucket")
    },
    Some(s"""WITH lens AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS tok_len
            |              FROM documents),
            |bins AS (
            |  SELECT bucket, cap, count(*) AS n_docs,
            |         CAST(sum(tok_len) AS BIGINT) AS sum_tokens,
            |         CAST(count(*) * cap AS BIGINT) AS padded_tokens
            |  FROM (SELECT tok_len // 64 AS bucket,
            |               (tok_len // 64 + 1) * 64 AS cap, tok_len FROM lens)
            |  GROUP BY bucket, cap),
            |g AS (SELECT round(CAST(count(*) * max(tok_len) - sum(tok_len) AS DOUBLE) /
            |             CAST(count(*) * max(tok_len) AS DOUBLE) * 100, 4) AS naive_waste_pct
            |      FROM lens)
            |SELECT bucket, cap, n_docs, sum_tokens, padded_tokens,
            |       round(CAST(padded_tokens - sum_tokens AS DOUBLE) /
            |             CAST(padded_tokens AS DOUBLE) * 100, 4) AS waste_pct,
            |       naive_waste_pct
            |FROM bins CROSS JOIN g ORDER BY bucket""".stripMargin))

  /** q190 — inter-gate agreement (Cohen's kappa): before a pipeline
    * swaps its cheap heuristic filter (q36's quality score) for a
    * model-based one (q185's linear gate), it measures how often the
    * two agree beyond chance. Per language: observed agreement po,
    * chance agreement pe from the marginals, kappa = (po−pe)/(1−pe)
    * (0 when pe = 1 — two constant raters have no chance-corrected
    * signal). pe is computed from RATIOS, not n² products, so the
    * arithmetic cannot overflow at corpus scale. Both gate decisions
    * are scan-side column math; only per-language counts shuffle. */
  val q190ClassifierKappa = GQuery(
    "q190_classifier_kappa",
    (s, d) => {
      import s.implicits._
      val tks = TextAnalysis.tokens($"text")
      val mScore = round(
        aggregate(
          transform(tks, w =>
            (TextAnalysis.tokenHash60(w) % 1000003L).cast("double") / 1000003.0 - 0.5),
          lit(0.0), (acc, x) => acc + x) / size(tks).cast("double"), 6)
      val gated = Tables.documents(s, d)
        .where(size(tks) > 0)
        .select($"lang",
          when(TextAnalysis.qualityScore($"text") >= 0.5, 1).otherwise(0).as("h"),
          when(mScore >= 0, 1).otherwise(0).as("m"))
      val agg = gated.groupBy($"lang").agg(
        count(lit(1)).as("n_docs"),
        count(when($"h" === 1 && $"m" === 1, 1)).as("a11"),
        count(when($"h" === 0 && $"m" === 0, 1)).as("a00"),
        count(when($"h" === 1, 1)).as("h1"),
        count(when($"m" === 1, 1)).as("m1"))
      val po = ($"a11" + $"a00").cast("double") / $"n_docs"
      val pe = ($"h1".cast("double") / $"n_docs") * ($"m1".cast("double") / $"n_docs") +
        (($"n_docs" - $"h1").cast("double") / $"n_docs") *
          (($"n_docs" - $"m1").cast("double") / $"n_docs")
      agg.select($"lang", $"n_docs",
          round(po, 6).as("po"), round(pe, 6).as("pe"),
          when(pe === 1.0, 0.0).otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
        .orderBy($"lang")
    },
    Some {
      val sw = TextAnalysis.Stopwords.map("'" + _ + "'").mkString(",")
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |d AS (SELECT lang,
         |  CASE WHEN round(
         |    0.4 * (len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE))
         |    + 0.3 * least(5.0 * (len(list_filter(toks, x -> lower(x) IN ($sw))) / CAST(len(toks) AS DOUBLE)), 1.0)
         |    + 0.3 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0), 4) >= 0.5
         |    THEN 1 ELSE 0 END AS h,
         |  CASE WHEN round(list_sum(list_transform(toks, w ->
         |      CAST(${h60of("w")} % 1000003 AS DOUBLE) / 1000003.0 - 0.5))
         |      / CAST(len(toks) AS DOUBLE), 6) >= 0
         |    THEN 1 ELSE 0 END AS m
         |  FROM t WHERE len(toks) > 0),
         |agg AS (SELECT lang, count(*) AS n_docs,
         |  count(*) FILTER (WHERE h = 1 AND m = 1) AS a11,
         |  count(*) FILTER (WHERE h = 0 AND m = 0) AS a00,
         |  count(*) FILTER (WHERE h = 1) AS h1,
         |  count(*) FILTER (WHERE m = 1) AS m1
         |  FROM d GROUP BY lang)
         |SELECT lang, n_docs,
         |  round((a11 + a00) / CAST(n_docs AS DOUBLE), 6) AS po,
         |  round((CAST(h1 AS DOUBLE) / n_docs) * (CAST(m1 AS DOUBLE) / n_docs)
         |      + (CAST(n_docs - h1 AS DOUBLE) / n_docs) * (CAST(n_docs - m1 AS DOUBLE) / n_docs), 6) AS pe,
         |  CASE WHEN (CAST(h1 AS DOUBLE) / n_docs) * (CAST(m1 AS DOUBLE) / n_docs)
         |      + (CAST(n_docs - h1 AS DOUBLE) / n_docs) * (CAST(n_docs - m1 AS DOUBLE) / n_docs) = 1.0
         |    THEN 0.0
         |    ELSE round(((a11 + a00) / CAST(n_docs AS DOUBLE)
         |      - ((CAST(h1 AS DOUBLE) / n_docs) * (CAST(m1 AS DOUBLE) / n_docs)
         |         + (CAST(n_docs - h1 AS DOUBLE) / n_docs) * (CAST(n_docs - m1 AS DOUBLE) / n_docs)))
         |      / (1.0 - ((CAST(h1 AS DOUBLE) / n_docs) * (CAST(m1 AS DOUBLE) / n_docs)
         |         + (CAST(n_docs - h1 AS DOUBLE) / n_docs) * (CAST(n_docs - m1 AS DOUBLE) / n_docs))), 6)
         |  END AS kappa
         |FROM agg ORDER BY lang""".stripMargin
    })

  /** q191 — DSIR importance resampling (Xie et al. 2023): treat src0
    * as the curated TARGET corpus and resample 50 docs from the raw
    * pool (every other source) proportionally to how target-like their
    * hashed bag-of-{uni,bi}gram distribution is. Weights are bucketed
    * add-one-smoothed log ratios summed per doc; selection is
    * Gumbel-top-k with hash-derived (deterministic) noise. The
    * log-ratio table is ≤ 512 rows (broadcast); the only data-sized
    * shuffle carries per-doc partial sums keyed by doc_id; the final
    * cut is TakeOrderedAndProject, not a sort.
    */
  val q191DsirSelection = GQuery(
    "q191_dsir_selection",
    (s, d) => {
      import s.implicits._
      val B = 512
      val feats = graft.operators.ImportanceSampling
        .features(Tables.documents(s, d), B)
      val isTarget = $"source" === "src0"
      val ratios = graft.operators.ImportanceSampling.logRatios(feats, isTarget, B)
      val w = graft.operators.ImportanceSampling.logWeights(feats, isTarget, ratios)
      graft.operators.ImportanceSampling.select(w, 50)
        .select($"doc_id", $"source", round($"logw", 4).as("logw"), $"sel_key")
    },
    Some(s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
            |uni AS (SELECT doc_id, source, ${h60of("t[i]")} % 512 AS b
            |        FROM (SELECT doc_id, source, t,
            |                unnest(range(1, len(t) + 1)) AS i FROM toks)),
            |bi AS (SELECT doc_id, source, ${h60of("t[i] || ' ' || t[i+1]")} % 512 AS b
            |       FROM (SELECT doc_id, source, t,
            |               unnest(range(1, len(t))) AS i FROM toks)),
            |f AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
            |tc AS (SELECT b, count(*) AS tn FROM f WHERE source = 'src0' GROUP BY b),
            |rc AS (SELECT b, count(*) AS rn FROM f WHERE source <> 'src0' GROUP BY b),
            |tt AS (SELECT sum(tn) AS ttot FROM tc),
            |rt AS (SELECT sum(rn) AS rtot FROM rc),
            |lr AS (SELECT b, round(ln((COALESCE(tn, 0) + 1.0) / (ttot + 512))
            |                     - ln((rn + 1.0) / (rtot + 512)), 6) AS lr
            |       FROM rc LEFT JOIN tc USING (b) CROSS JOIN tt CROSS JOIN rt),
            |w AS (SELECT doc_id, any_value(source) AS source,
            |             CAST(sum(CAST(round(lr * 1000000.0) AS BIGINT)) AS DOUBLE)
            |               / 1000000.0 AS logw
            |      FROM f JOIN lr USING (b) WHERE source <> 'src0' GROUP BY doc_id)
            |SELECT doc_id, source, round(logw, 4) AS logw,
            |       round(logw - ln(-ln(
            |         (${h60of("CAST(doc_id AS VARCHAR) || ':dsir'")} + 0.5)
            |           / 1152921504606846976.0)), 6) AS sel_key
            |FROM w ORDER BY sel_key DESC, doc_id LIMIT 50""".stripMargin),
    benchmark = true)

  /** q192 — tokenizer fertility / byte economics per language: how
    * many bytes and characters each language pays per token, plus the
    * whitespace overhead — the stats that size a tokenizer's vocab
    * budget and predict context-window cost per language. Pure
    * scan-side column math; only per-language sums shuffle.
    */
  val q192TokenFertility = GQuery(
    "q192_token_fertility",
    (s, d) => {
      import s.implicits._
      val t = TextAnalysis.tokens($"text")
      val tokChars = aggregate(transform(t, w => length(w).cast("long")),
        lit(0L), (acc, x) => acc + x)
      Tables.documents(s, d)
        .select($"lang", length($"text").cast("long").as("chars"),
          octet_length($"text").cast("long").as("bytes"),
          size(t).cast("long").as("toks"), tokChars.as("tok_chars"))
        .where($"toks" > 0)
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"toks").as("n_tokens"),
          sum($"bytes").as("n_bytes"),
          round(sum($"bytes").cast("double") / sum($"toks").cast("double"), 4)
            .as("bytes_per_tok"),
          round(sum($"tok_chars").cast("double") / sum($"toks").cast("double"), 4)
            .as("avg_tok_len"),
          round((sum($"chars") - sum($"tok_chars")).cast("double") /
            sum($"chars").cast("double"), 4).as("ws_frac"))
        .orderBy($"lang")
    },
    Some(s"""WITH t AS (
            |  SELECT lang, CAST(length(text) AS BIGINT) AS chars,
            |         CAST(strlen(text) AS BIGINT) AS bytes,
            |         CAST(len($toksSql) AS BIGINT) AS toks,
            |         CAST(COALESCE(list_sum(list_transform($toksSql,
            |           x -> length(x))), 0) AS BIGINT) AS tok_chars
            |  FROM documents)
            |SELECT lang, count(*) AS n_docs,
            |       CAST(sum(toks) AS BIGINT) AS n_tokens,
            |       CAST(sum(bytes) AS BIGINT) AS n_bytes,
            |       round(CAST(sum(bytes) AS DOUBLE) / sum(toks), 4) AS bytes_per_tok,
            |       round(CAST(sum(tok_chars) AS DOUBLE) / sum(toks), 4) AS avg_tok_len,
            |       round(CAST(sum(chars) - sum(tok_chars) AS DOUBLE) / sum(chars), 4)
            |         AS ws_frac
            |FROM t WHERE toks > 0
            |GROUP BY lang ORDER BY lang""".stripMargin))

  /** q204 — DSIR selection at corpus scale
    * ([[graft.operators.ImportanceSampling.selectByThreshold]]): the
    * same Gumbel-top-k sample as q191 but selected by a DISTRIBUTED
    * quantile threshold — one scalar on the driver, then a filter —
    * instead of TakeOrderedAndProject's driver-bounded k. The query
    * runs BOTH paths and oracle-checks the agreement contract:
    * `size_ok` pins |threshold set| ∈ k ± 2·ceil(relErr·n), and
    * `overlap_ok` pins that at most that tolerance of the exact top-k
    * is missing — the approxQuantile rank guarantee, measured on real
    * data. (The booleans are the honest output: the threshold set's
    * exact membership depends on the sketch's internal merge order,
    * which no other engine reproduces — same pattern as q60's sketch
    * tolerances.) */
  val q204DsirThreshold = GQuery(
    "q204_dsir_threshold",
    (s, d) => {
      import s.implicits._
      val B = 512
      val feats = graft.operators.ImportanceSampling
        .features(Tables.documents(s, d), B)
      val isTarget = $"source" === "src0"
      val ratios = graft.operators.ImportanceSampling.logRatios(feats, isTarget, B)
      val w = graft.operators.ImportanceSampling
        .logWeights(feats, isTarget, ratios).cache()
      try {
        val k = 50; val relErr = 0.005
        val n = w.count()
        val tol = math.ceil(2 * relErr * n).toLong
        val exact = graft.operators.ImportanceSampling.select(w, k).select($"doc_id")
        val thr = graft.operators.ImportanceSampling
          .selectByThreshold(w, k, relErr = relErr)
        val bSize = thr.count()
        val overlap = thr.join(exact, Seq("doc_id"), "left_semi").count()
        Seq((k, bSize >= k - tol && bSize <= k + tol, overlap >= k - tol))
          .toDF("k", "size_ok", "overlap_ok")
      } finally { w.unpersist(); () }
    },
    Some("SELECT 50 AS k, true AS size_ok, true AS overlap_ok"))

  /** q233 — GOPHER repetition signals ([[graft.operators.Curation
    * .repetitionSignals]], Rae et al. 2021 §A1.1): per document, the
    * character fraction covered by the most frequent word 2-gram and
    * the fraction inside repeated 3-grams, thresholded per language —
    * the quality-filter block every public LLM corpus recipe applies
    * between langid and dedup. Flags compare the SAME double division
    * both engines compute (cnt·len(gram) / len(text)), so parity is
    * bit-exact; no floating sums cross the oracle boundary. */
  val q233GopherRepetition = GQuery(
    "q233_gopher_repetition",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"lang", $"text")
      val sig = graft.operators.Curation
        .repetitionSignals(docs, "doc_id", $"text")
      docs.select($"doc_id", $"lang").join(sig, Seq("doc_id"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when($"top_frac" > 0.2, 1L).otherwise(0L)).as("top_gt20"),
          sum(when($"top_frac" > 0.5, 1L).otherwise(0L)).as("top_gt50"),
          sum(when($"dup_frac" > 0.1, 1L).otherwise(0L)).as("dup_gt10"),
          sum(when($"dup_frac" > 0.3, 1L).otherwise(0L)).as("dup_gt30"))
        .orderBy($"lang")
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, lang, length(text) AS L,
           |         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ts
           |  FROM documents),
           |g2 AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
           |       FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)),
           |c2 AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2),
           |t2 AS (SELECT doc_id, cnt * length(g) AS chars,
           |              row_number() OVER (PARTITION BY doc_id
           |                                 ORDER BY cnt DESC, g DESC) AS rn
           |       FROM c2),
           |top AS (SELECT doc_id, chars FROM t2 WHERE rn = 1),
           |g3 AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
           |       FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)),
           |c3 AS (SELECT doc_id, g, count(*) AS cnt FROM g3 GROUP BY 1, 2),
           |dup AS (SELECT doc_id,
           |               sum(CASE WHEN cnt >= 2 THEN cnt * length(g) END) AS chars
           |        FROM c3 GROUP BY 1),
           |f AS (SELECT toks.doc_id, lang,
           |             coalesce(top.chars, 0) / CAST(L AS DOUBLE) AS top_frac,
           |             coalesce(dup.chars, 0) / CAST(L AS DOUBLE) AS dup_frac
           |      FROM toks LEFT JOIN top USING (doc_id)
           |                LEFT JOIN dup USING (doc_id))
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN top_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS top_gt20,
           |  CAST(sum(CASE WHEN top_frac > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS top_gt50,
           |  CAST(sum(CASE WHEN dup_frac > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_gt10,
           |  CAST(sum(CASE WHEN dup_frac > 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS dup_gt30
           |FROM f GROUP BY lang ORDER BY lang""".stripMargin))

  /** q235 — the CURATION FUNNEL (FineWeb/RefinedWeb-shaped): raw →
    * langid gate → Gopher repetition gate → composite quality gate →
    * exact dedup (min doc_id per fingerprint), with (n_docs,
    * sum_chars) pinned AT EVERY STAGE — the end-to-end recipe a
    * pretraining pipeline runs, each block already individually
    * oracle-pinned (q37 langid, q233 repetition, q36 quality, q38
    * fingerprint), here composed so stage INTERACTIONS are pinned
    * too. Every gate compares values both engines compute through
    * identical IEEE operations (single divisions, the q36-proven
    * formula order, integer counts), so the funnel is exact at any
    * scale. 100 TB shape: three scan-side filters, one (id,gram)
    * aggregation, one fingerprint hash-shuffle — no windows over the
    * corpus, no driver state. */
  val q235CurationFunnel = GQuery(
    "q235_curation_funnel",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"text", $"n_chars")
      val en = docs.filter(TextAnalysis.langId($"text") === "en")
      val sig = graft.operators.Curation.repetitionSignals(en, "doc_id", $"text")
      val gop = en.join(
        sig.filter($"top_frac" <= 0.2 && $"dup_frac" <= 0.3).select($"doc_id"),
        Seq("doc_id"))
      val qual = gop.filter(TextAnalysis.qualityScore($"text") >= 0.5)
      val kept = qual.withColumn("fp", TextAnalysis.fingerprint($"text"))
        .groupBy($"fp")
        .agg(min($"doc_id").as("doc_id"),
          min_by($"n_chars", $"doc_id").as("n_chars"))
      def stage(name: String, df: org.apache.spark.sql.DataFrame) =
        df.groupBy().agg(count(lit(1)).as("n_docs"),
            coalesce(sum($"n_chars"), lit(0L)).cast("long").as("sum_chars"))
          .select(lit(name).as("stage"), $"n_docs", $"sum_chars")
      stage("1_raw", docs)
        .unionByName(stage("2_lang", en))
        .unionByName(stage("3_gopher", gop))
        .unionByName(stage("4_quality", qual))
        .unionByName(stage("5_dedup", kept))
        .orderBy($"stage")
    },
    Some(s"""WITH toks AS (
           |  SELECT doc_id, text, n_chars, length(text) AS L,
           |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ts
           |  FROM documents),
           |hits AS (
           |  SELECT *,
           |    len(regexp_extract_all(lower(text), ' (the|and|of|to|is) ')) AS en_hits,
           |    len(regexp_extract_all(lower(text), ' (der|die|das|und|ist) ')) AS de_hits,
           |    len(regexp_extract_all(lower(text), ' (el|la|los|de|es) ')) AS es_hits
           |  FROM toks),
           |lang AS (
           |  SELECT doc_id, text, n_chars, L, ts FROM hits
           |  WHERE de_hits <= en_hits AND es_hits <= greatest(en_hits, de_hits)),
           |g2 AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
           |       FROM lang, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)),
           |c2 AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2),
           |t2 AS (SELECT doc_id, cnt * length(g) AS chars,
           |              row_number() OVER (PARTITION BY doc_id
           |                                 ORDER BY cnt DESC, g DESC) AS rn
           |       FROM c2),
           |top AS (SELECT doc_id, chars FROM t2 WHERE rn = 1),
           |g3 AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
           |       FROM lang, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)),
           |c3 AS (SELECT doc_id, g, count(*) AS cnt FROM g3 GROUP BY 1, 2),
           |dup AS (SELECT doc_id,
           |               sum(CASE WHEN cnt >= 2 THEN cnt * length(g) END) AS chars
           |        FROM c3 GROUP BY 1),
           |gop AS (
           |  SELECT lang.* FROM lang
           |  LEFT JOIN top USING (doc_id) LEFT JOIN dup USING (doc_id)
           |  WHERE coalesce(top.chars, 0) / CAST(L AS DOUBLE) <= 0.2
           |    AND coalesce(dup.chars, 0) / CAST(L AS DOUBLE) <= 0.3),
           |qual AS (
           |  SELECT * FROM gop WHERE round(
           |    0.4 * (len(list_distinct(ts)) / CAST(len(ts) AS DOUBLE))
           |    + 0.3 * least((len(list_filter(ts, x -> lower(x) IN (${TextAnalysis.Stopwords.map("'" + _ + "'").mkString(",")}))) / CAST(len(ts) AS DOUBLE)) * 5.0, 1.0)
           |    + 0.3 * least(CAST(len(ts) AS DOUBLE) / 100.0, 1.0), 4) >= 0.5),
           |kept AS (
           |  SELECT min(doc_id) AS doc_id,
           |         min_by(n_chars, doc_id) AS n_chars
           |  FROM (SELECT doc_id, n_chars,
           |          md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
           |        FROM qual)
           |  GROUP BY fp)
           |SELECT '1_raw' AS stage, count(*) AS n_docs,
           |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars FROM documents
           |UNION ALL SELECT '2_lang', count(*),
           |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM lang
           |UNION ALL SELECT '3_gopher', count(*),
           |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM gop
           |UNION ALL SELECT '4_quality', count(*),
           |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM qual
           |UNION ALL SELECT '5_dedup', count(*),
           |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) FROM kept
           |ORDER BY stage""".stripMargin))

  /** q244 — BPE ENCODE ([[graft.operators.Bpe]]): apply a learned
    * merge list for real — the other half of q152's training
    * statistics. The 2000 most frequent alphabetic words encode under
    * the pinned 18-merge table (classic Sennrich batch apply: lowest
    * applicable rank, all non-overlapping occurrences fused left to
    * right, repeat), then corpus-weighted token frequencies come from
    * joining the encoded WORD TABLE back — encode cost scales with
    * vocabulary, never corpus. The DuckDB oracle replays the exact
    * merge sequence with a recursive CTE over a bracketed token string
    * (`(t)(h)(e)` → `(th)(e)` → `(the)`; `replace()`'s left-to-right
    * non-overlap IS the batch fusion rule), so the procedural Scala
    * apply is pinned end to end — token accounting (chunking, packing,
    * mixing) can now run on real BPE counts instead of
    * whitespace/regex proxies. */
  val q244BpeEncode = GQuery(
    "q244_bpe_encode",
    (s, d) => {
      import s.implicits._
      val words = Tables.documents(s, d)
        .select(explode(transform(TextAnalysis.tokens($"text"), lower(_))).as("w"))
        .where($"w".rlike("^[a-z]+$"))
        .groupBy($"w").agg(count(lit(1)).as("wc"))
        .orderBy($"wc".desc, $"w".asc).limit(2000)
      graft.operators.Bpe.encodeWords(words, "w", graft.operators.Bpe.EnglishMerges)
        .select($"wc", explode($"bpe").as("tok"))
        .groupBy($"tok").agg(sum($"wc").cast("long").as("n"))
        .orderBy($"n".desc, $"tok".asc).limit(25)
    },
    Some(s"""WITH RECURSIVE
            |merges(rank, l, r) AS (VALUES (1,'t','h'),(2,'th','e'),(3,'i','n'),
            |  (4,'a','n'),(5,'an','d'),(6,'e','r'),(7,'o','n'),(8,'r','e'),
            |  (9,'in','g'),(10,'o','r'),(11,'e','n'),(12,'a','t'),(13,'e','s'),
            |  (14,'o','u'),(15,'t','o'),(16,'s','t'),(17,'a','r'),(18,'o','f')),
            |words AS (
            |  SELECT w, wc FROM (
            |    SELECT w, count(*) AS wc FROM (
            |      SELECT unnest(list_transform($toksSql, x -> lower(x))) AS w
            |      FROM documents)
            |    WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w)
            |  ORDER BY wc DESC, w LIMIT 2000),
            |enc AS (
            |  SELECT w, '(' || array_to_string(list_transform(range(length(w)),
            |    i -> w[CAST(i AS INT)+1]), ')(') || ')' AS s
            |  FROM words
            |  UNION ALL
            |  SELECT e.w,
            |    replace(e.s, '(' || m.l || ')(' || m.r || ')',
            |      '(' || m.l || m.r || ')')
            |  FROM enc e JOIN merges m ON m.rank = (
            |    SELECT min(m2.rank) FROM merges m2
            |    WHERE contains(e.s, '(' || m2.l || ')(' || m2.r || ')'))),
            |final_enc AS (
            |  SELECT w, s FROM enc e WHERE NOT EXISTS (
            |    SELECT 1 FROM merges m
            |    WHERE contains(e.s, '(' || m.l || ')(' || m.r || ')'))),
            |toks AS (SELECT w, unnest(string_split(trim(s, '()'), ')(')) AS tok
            |         FROM final_enc)
            |SELECT tok, CAST(sum(wc) AS BIGINT) AS n
            |FROM toks JOIN words USING (w)
            |GROUP BY tok ORDER BY n DESC, tok LIMIT 25""".stripMargin))

  /** q247/q248 share q244's vocabulary (top-2000 lowercase [a-z]+
    * words by corpus frequency, fully tie-broken). */
  private def bpeVocab(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(transform(TextAnalysis.tokens($"text"), lower(_))).as("w"))
      .where($"w".rlike("^[a-z]+$"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .orderBy($"wc".desc, $"w".asc).limit(2000)
  }

  private val BpeVocabSql =
    s"""words AS MATERIALIZED (
       |  SELECT w, wc FROM (
       |    SELECT w, count(*) AS wc FROM (
       |      SELECT unnest(list_transform($toksSql, x -> lower(x))) AS w
       |      FROM documents)
       |    WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w)
       |  ORDER BY wc DESC, w LIMIT 2000)""".stripMargin

  private val BpeLearnK = 8

  /** The oracle's UNROLLED training course: per round j, pair counts
    * p{j} from the previous tokenization, argmax m{j} (count desc,
    * pair lexicographic), application t{j} via `replace` on the
    * parenthesized token string (left-to-right non-overlapping —
    * exactly [[graft.operators.Bpe.applyOneMerge]]'s fold). No
    * recursion-with-aggregation needed: K is a fixed constant, so the
    * course unrolls into plain chained CTEs. */
  private def bpeLearnCtes(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """t0 AS MATERIALIZED (
        |  SELECT w, wc, '(' || array_to_string(list_transform(range(length(w)),
        |    i -> w[CAST(i AS INT)+1]), ')(') || ')' AS s
        |  FROM words)""".stripMargin)
    for (j <- 1 to k) {
      sb.append(s""",
                   |tk${j - 1} AS MATERIALIZED (
                   |  SELECT w, wc, string_split(trim(s, '()'), ')(') AS toks
                   |  FROM t${j - 1}),
                   |p$j AS (
                   |  SELECT pr['l'] AS l, pr['r'] AS r, CAST(sum(wc) AS BIGINT) AS n
                   |  FROM (
                   |    SELECT wc, unnest(list_transform(range(len(toks)-1),
                   |      q -> {'l': toks[CAST(q AS INT)+1],
                   |            'r': toks[CAST(q AS INT)+2]})) AS pr
                   |    FROM tk${j - 1} WHERE len(toks) >= 2)
                   |  GROUP BY 1, 2),
                   |m$j AS MATERIALIZED (SELECT l, r, n FROM p$j ORDER BY n DESC, l, r LIMIT 1),
                   |t$j AS MATERIALIZED (SELECT w, wc, replace(s,
                   |  '(' || (SELECT l FROM m$j) || ')(' || (SELECT r FROM m$j) || ')',
                   |  '(' || (SELECT l || r FROM m$j) || ')') AS s FROM t${j - 1})""".stripMargin)
    }
    sb.toString
  }

  /** q247 — BPE TRAINING, the other half of q152's counting kernel
    * and the feeder of q244's encoder: learn K merges over the corpus
    * vocabulary ([[graft.operators.Bpe.learnMerges]] — per round one
    * vocabulary-scaled pair count + a one-row argmax collect). Output
    * is the full training course: each merge with its selection-time
    * pair count AND the vocab's weighted token count after applying
    * it — so the oracle (an unrolled K-stage replay in plain SQL)
    * pins not just which pairs win but that each application fused
    * exactly the right occurrences. */
  val q247BpeLearn = GQuery(
    "q247_bpe_learn",
    (s, d) => {
      import s.implicits._
      val learned = graft.operators.Bpe.learnMerges(
        bpeVocab(s, d), "w", "wc", BpeLearnK)
      learned.zipWithIndex.map { case (m, i) =>
        (i + 1, m.l, m.r, m.pairCount, m.tokensAfter)
      }.toDF("mrank", "l", "r", "pair_n", "toks_after")
    },
    Some {
      val rows = (1 to BpeLearnK).map { j =>
        s"""SELECT $j AS mrank, (SELECT l FROM m$j) AS l,
           |  (SELECT r FROM m$j) AS r,
           |  (SELECT n FROM m$j) AS pair_n,
           |  (SELECT CAST(sum(wc * len(string_split(trim(s, '()'), ')(')))
           |     AS BIGINT) FROM t$j) AS toks_after""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $BpeVocabSql,
         |${bpeLearnCtes(BpeLearnK)}
         |SELECT * FROM ($rows) ORDER BY mrank""".stripMargin
    })

  /** q248 — the CLOSED train→encode loop: learn K merges (q247's
    * course), hand them to [[graft.operators.Bpe.encodeWords]] as a
    * rank-ordered merge table, and report the encoded vocabulary's
    * top token counts (q244's shape, under LEARNED merges instead of
    * the pinned English table). The oracle takes the unrolled
    * training's FINAL tokenization t{K} — classic BPE's invariant
    * that rank-greedy encoding replays training on the training
    * vocabulary — so a divergence in either the learner, the encoder,
    * or their agreement turns the row red. */
  val q248BpeLearnedEncode = GQuery(
    "q248_bpe_learned_encode",
    (s, d) => {
      import s.implicits._
      val words = bpeVocab(s, d).persist()
      val learned = graft.operators.Bpe.learnMerges(words, "w", "wc", BpeLearnK)
        .map(m => (m.l, m.r))
      val out = graft.operators.Bpe.encodeWords(words, "w", learned)
        .select($"wc", explode($"bpe").as("tok"))
        .groupBy($"tok").agg(sum($"wc").cast("long").as("n"))
        .orderBy($"n".desc, $"tok".asc).limit(25)
      val materialized = out.collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      words.unpersist()
      materialized.toDF("tok", "n")
    },
    Some(s"""WITH $BpeVocabSql,
            |${bpeLearnCtes(BpeLearnK)}
            |SELECT tok, CAST(sum(wc) AS BIGINT) AS n FROM (
            |  SELECT wc, unnest(string_split(trim(s, '()'), ')(')) AS tok
            |  FROM t$BpeLearnK)
            |GROUP BY tok ORDER BY n DESC, tok LIMIT 25""".stripMargin))

  val all: Seq[GQuery] = Seq(
    q233GopherRepetition, q235CurationFunnel,
    q117ChunkDedup, q118PiiRedaction, q119Contamination, q120DomainStats,
    q121WeightedResample, q122VocabCoverage, q123TrainingOrder, q135BigramLm,
    q150DupNgrams, q151AdaptiveQuality, q152BpePairs, q169DataMixing,
    q172CorpusRelease, q173VocabOverlap, q182PplBuckets, q185ClassifierGate,
    q187Calibration, q188PaddingWaste, q190ClassifierKappa, q191DsirSelection,
    q192TokenFertility, q204DsirThreshold, q244BpeEncode, q247BpeLearn,
    q248BpeLearnedEncode)
}
