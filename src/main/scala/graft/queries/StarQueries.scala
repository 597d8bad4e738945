package graft.queries

import graft.Tables
import graft.functions.{Classify, TextAnalysis}
import graft.operators.{Multimodal, StarSchema, Validator}
import graft.streaming.Streams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Gold-layer star schema, warehouse validation, multimodal plumbing and
  * the batch twin of the streaming window agg — the E2/E3 lifecycle of
  * SURVEY §3 re-expressed as one lazy Spark lineage per query.
  */
object StarQueries {

  /** dim_fecha's date domain in oracle SQL — the union of every date
    * column that FKs into it (mirrors StarSchema.dateDomain; the
    * reference's get-or-create fecha map, loader_NeonDB.py:271-293). */
  private val DatesCte =
    """dates AS (
      |  SELECT CAST(o_orderdate AS DATE) AS fecha FROM orders WHERE o_orderdate IS NOT NULL
      |  UNION
      |  SELECT CAST(l_shipdate AS DATE) FROM lineitem WHERE l_shipdate IS NOT NULL)""".stripMargin

  private val DimFechaCte =
    s"""$DatesCte,
       |dim_fecha AS (
       |  SELECT fecha, CAST(row_number() OVER (ORDER BY fecha) AS INT) AS fecha_id,
       |         CAST(year(fecha) AS INT) AS anio
       |  FROM dates)""".stripMargin

  /** Tag dim + part↔tag bridge in oracle SQL (mirrors StarSchema.dimTag
    * / bridgePartTag over p_name's word list). */
  private val TagCtes =
    """tags AS (
      |  SELECT DISTINCT trim(w) AS tag_nombre
      |  FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part) t
      |  WHERE trim(w) <> ''),
      |dim_tag AS (
      |  SELECT tag_nombre, CAST(row_number() OVER (ORDER BY tag_nombre) AS INT) AS tag_id
      |  FROM tags),
      |ptag AS (
      |  SELECT DISTINCT p_partkey, trim(w) AS tag_nombre
      |  FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS w FROM part) t
      |  WHERE trim(w) <> '')""".stripMargin

  /** Star dimension with deterministic SERIAL-style surrogate keys
    * (loader_NeonDB.py:94-117 → row_number over canonical order). */
  val q32DimCustomer = GQuery(
    "q32_dim_customer",
    (s, d) => {
      import s.implicits._
      StarSchema.dimCustomer(Tables.customer(s, d), Tables.nation(s, d), Tables.region(s, d))
        .select($"customer_sk", $"c_custkey", $"c_name", $"c_mktsegment", $"nation", $"region")
    },
    Some("""SELECT CAST(row_number() OVER (ORDER BY c_custkey) AS INT) AS customer_sk,
           |  c_custkey, c_name, c_mktsegment, n_name AS nation, r_name AS region
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey""".stripMargin))

  /** Fact table with FK surrogate resolution via broadcast dim lookups
    * (loader_NeonDB.py:556-605). */
  val q33FactOrders = GQuery(
    "q33_fact_orders",
    (s, d) => {
      import s.implicits._
      val star = StarSchema.build(s, d)
      star("fact_orders")
    },
    Some(s"""WITH $DimFechaCte,
            |dim_customer AS (
            |  SELECT c_custkey, CAST(row_number() OVER (ORDER BY c_custkey) AS INT) AS customer_sk
            |  FROM customer)
            |SELECT o_orderkey, fecha_id, customer_sk, o_totalprice, o_orderstatus, anio
            |FROM orders
            |JOIN dim_fecha ON CAST(o_orderdate AS DATE) = fecha
            |JOIN dim_customer ON o_custkey = c_custkey""".stripMargin))

  /** Star-join analytics over the built schema (the gold-layer query
    * shape the warehouse exists for). */
  val q34StarAgg = GQuery(
    "q34_star_agg",
    (s, d) => {
      import s.implicits._
      val star = StarSchema.build(s, d)
      // anio rides on the fact itself (its partition column) — one
      // less dim join than the reference's equivalent rollup
      star("fact_orders")
        .join(graft.operators.Joins.maybeBroadcast(
          star("dim_customer").select($"customer_sk", $"region")), "customer_sk")
        .groupBy($"anio", $"region")
        .agg(round(sum($"o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
    },
    Some(s"""WITH $DimFechaCte,
            |dim_customer AS (
            |  SELECT c_custkey, CAST(row_number() OVER (ORDER BY c_custkey) AS INT) AS customer_sk,
            |         r_name AS region
            |  FROM customer JOIN nation ON c_nationkey = n_nationkey
            |                JOIN region ON n_regionkey = r_regionkey)
            |SELECT anio, region,
            |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            |FROM orders
            |JOIN dim_fecha ON CAST(o_orderdate AS DATE) = fecha
            |JOIN dim_customer ON o_custkey = c_custkey
            |GROUP BY anio, region""".stripMargin),
    benchmark = true)

  /** Warehouse integrity report: PK uniqueness + FK orphans
    * (validator_warehouse.py:72-164 promoted to a first-class query). */
  val q39ValidationReport = GQuery(
    "q39_validation_report",
    (s, d) => Validator.report(StarSchema.build(s, d)),
    Some(s"""WITH $DatesCte,
            |$TagCtes,
            |pairs AS (SELECT DISTINCT l_orderkey AS orderkey, l_partkey AS partkey FROM lineitem),
            |valid_orders AS (
            |  SELECT o_orderkey FROM orders
            |  WHERE o_orderdate IS NOT NULL
            |    AND o_custkey IN (SELECT c_custkey FROM customer))
            |SELECT 'uniq_dim_fecha' AS check_name, CAST(count(DISTINCT fecha) - count(DISTINCT fecha) AS BIGINT) AS n_bad FROM dates
            |UNION ALL SELECT 'uniq_dim_customer', count(*) - count(DISTINCT c_custkey) FROM customer
            |UNION ALL SELECT 'uniq_dim_part', count(*) - count(DISTINCT p_partkey) FROM part
            |UNION ALL SELECT 'uniq_dim_tag', count(*) - count(DISTINCT tag_nombre) FROM tags
            |UNION ALL SELECT 'uniq_fact_orders', count(*) - count(DISTINCT o_orderkey) FROM orders
            |UNION ALL SELECT 'uniq_bridge_order_part', count(*) - count(DISTINCT (orderkey, partkey)) FROM pairs
            |UNION ALL SELECT 'uniq_bridge_part_tag', count(*) - count(DISTINCT (p_partkey, tag_nombre)) FROM ptag
            |UNION ALL SELECT 'orphan_fact_fecha', count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders
            |UNION ALL SELECT 'orphan_fact_customer', count(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) FROM orders
            |UNION ALL SELECT 'orphan_bridge_order', count(*) FILTER (WHERE orderkey NOT IN (SELECT o_orderkey FROM valid_orders)) FROM pairs
            |UNION ALL SELECT 'orphan_bridge_part', count(*) FILTER (WHERE partkey NOT IN (SELECT p_partkey FROM part)) FROM pairs
            |UNION ALL SELECT 'orphan_bridge_tag', count(*) FILTER (WHERE tag_nombre NOT IN (SELECT tag_nombre FROM tags)) FROM ptag
            |UNION ALL SELECT 'orphan_metricas_fecha', count(*) FILTER (WHERE CAST(l_shipdate AS DATE) NOT IN (SELECT fecha FROM dates)) FROM lineitem""".stripMargin))

  /** E2 flagship pipeline (SURVEY §7.2): keyword include/exclude →
    * content dedup → classify → summary, on the documents corpus. */
  val q48FlagshipPipeline = GQuery(
    "q48_flagship_pipeline",
    (s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val rules = Seq("stream" -> "Streaming", "window" -> "Windowing",
        "join" -> "Joins", "group" -> "Aggregation")
      val filtered = Tables.documents(s, d)
        .filter(Classify.containsAny($"text", Seq("join", "merge", "group")) &&
          Classify.containsNone($"text", Seq("batch")))
      val deduped = filtered
        .withColumn("fp", TextAnalysis.fingerprint($"text"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"fp").orderBy($"doc_id".asc)))
        .filter($"rn" === 1)
      deduped
        .withColumn("category", Classify.keywordClassifier($"text", rules, "General"))
        .withColumn("n_tokens", TextAnalysis.tokenCount($"text"))
        .groupBy($"category")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("total_tokens"),
          round(avg($"n_tokens"), 4).as("avg_tokens"),
          countDistinct($"lang").as("n_langs"))
    },
    Some {
      val rules = Seq("stream" -> "Streaming", "window" -> "Windowing",
        "join" -> "Joins", "group" -> "Aggregation")
      s"""WITH filtered AS (
         |  SELECT *, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
         |    len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens
         |  FROM documents
         |  WHERE regexp_matches(lower(text), 'join|merge|group')
         |    AND NOT regexp_matches(lower(text), 'batch')),
         |deduped AS (
         |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |                 FROM filtered) WHERE rn = 1)
         |SELECT ${Classify.keywordClassifierSql("text", rules, "General")} AS category,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  round(avg(n_tokens), 4) AS avg_tokens, count(DISTINCT lang) AS n_langs
         |FROM deduped GROUP BY category""".stripMargin
    },
    benchmark = true)

  /** Multimodal metadata extraction over binary payloads: byte length,
    * sha256, deterministic fake decode (width/height) — the Spark-side
    * plumbing is real, the codec is stubbed (see Multimodal.fakeDecode). */
  val q50MultimodalMeta = GQuery(
    "q50_multimodal_meta",
    (s, d) => {
      import s.implicits._
      Multimodal.mediaTable(Tables.documents(s, d), "text")
        .groupBy(substring($"meta.sha256", 1, 1).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum($"meta.byte_len").as("total_bytes"),
          sum($"decoded.width".cast("long")).as("width_sum"),
          sum($"decoded.height".cast("long")).as("height_sum"))
    },
    Some("""SELECT substring(sha256(text), 1, 1) AS bucket, count(*) AS n,
           |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
           |  CAST(sum(CAST('0x' || substring(sha256(text), 1, 15) AS BIGINT) % 1280 + 32) AS BIGINT) AS width_sum,
           |  CAST(sum(CAST('0x' || substring(sha256(text), 16, 15) AS BIGINT) % 720 + 32) AS BIGINT) AS height_sum
           |FROM documents GROUP BY bucket""".stripMargin))

  /** Multimodal resize + frame-sample plans: aspect-preserving
    * bounding-box fit and uniform temporal sampling grid — the
    * integer/grid arithmetic is the real operator (the pixel resample
    * behind it is the stubbed codec), verified against a DuckDB twin
    * of the same formulas. */
  val q76MultimodalPlans = GQuery(
    "q76_multimodal_plans",
    (s, d) => {
      import s.implicits._
      Multimodal.mediaTable(Tables.documents(s, d), "text")
        .withColumn("rp", Multimodal.resizePlan($"decoded", 512))
        .withColumn("frames", Multimodal.frameSamplePlan($"decoded", 8))
        .groupBy($"rp.resized".as("resized"))
        .agg(count(lit(1)).as("n_items"),
          sum($"rp.out_width").as("w_total"),
          sum($"rp.out_height").as("h_total"),
          sum(size($"frames")).as("n_frames_sampled"),
          sum(aggregate($"frames", lit(0L), (a, x) => a + x)).as("frame_idx_sum"))
    },
    Some("""WITH dec AS (
           |  SELECT CAST('0x' || substring(sha256(text), 1, 15) AS BIGINT) % 1280 + 32 AS w,
           |         CAST('0x' || substring(sha256(text), 16, 15) AS BIGINT) % 720 + 32 AS h,
           |         CAST('0x' || substring(sha256(text), 1, 15) AS BIGINT) % 240 + 1 AS nf
           |  FROM documents),
           |rp AS (
           |  SELECT greatest(w, h) > 512 AS resized,
           |    CASE WHEN greatest(w, h) > 512
           |         THEN CAST(floor(w * 512.0 / greatest(w, h)) AS BIGINT) ELSE w END AS out_w,
           |    CASE WHEN greatest(w, h) > 512
           |         THEN CAST(floor(h * 512.0 / greatest(w, h)) AS BIGINT) ELSE h END AS out_h,
           |    CASE WHEN nf >= 8 THEN list_transform(range(0, 8), i -> CAST(floor(i * nf * 1.0 / 8) AS BIGINT))
           |         ELSE range(0, nf) END AS frames
           |  FROM dec)
           |SELECT resized, count(*) AS n_items,
           |  CAST(sum(out_w) AS BIGINT) AS w_total,
           |  CAST(sum(out_h) AS BIGINT) AS h_total,
           |  CAST(sum(len(frames)) AS BIGINT) AS n_frames_sampled,
           |  CAST(sum(list_sum(frames)) AS BIGINT) AS frame_idx_sum
           |FROM rp GROUP BY resized""".stripMargin))

  /** q176 — REAL image header decode (VERDICT r4 #4: the codec tier
    * stops being simulated). Per document a VALID PNG / JPEG / GIF
    * payload is assembled from arithmetic-derived dimensions (pure
    * column math over hex → unhex), one in four rows gets a corrupt
    * payload (raw text bytes); `Multimodal.decodeHeaders` then
    * byte-parses each payload inside mapPartitions (PNG IHDR, JPEG
    * SOF segment walk, GIF LSD — ImageCodec). The oracle NEVER sees
    * the binary: it recomputes the dimensions the decoder must hand
    * back, so a green row proves the builder→parser loop is exact,
    * corrupt rows surface as NULLs, and formats land where the
    * signature says. */
  val q176ImageHeaders = GQuery(
    "q176_image_headers",
    (s, d) => {
      import s.implicits._
      val w = (pmod($"doc_id", lit(1919)) + 1).cast("int")
      val h = (pmod($"doc_id", lit(1079)) + 1).cast("int")
      val payload = when(pmod($"doc_id", lit(4)) === 0, Multimodal.syntheticPng(w, h))
        .when(pmod($"doc_id", lit(4)) === 1, Multimodal.syntheticJpeg(w, h))
        .when(pmod($"doc_id", lit(4)) === 2, Multimodal.syntheticGif(w, h))
        .otherwise($"text".cast(BinaryType))
      val media = Tables.documents(s, d).select($"doc_id", payload.as("payload"))
      Multimodal.decodeHeaders(media, "payload")
        .select($"doc_id", $"img_format", $"img_width", $"img_height")
    },
    Some("""SELECT doc_id,
           |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
           |       WHEN 2 THEN 'gif' END AS img_format,
           |  CASE WHEN doc_id % 4 = 3 THEN NULL
           |       ELSE CAST(doc_id % 1919 + 1 AS INT) END AS img_width,
           |  CASE WHEN doc_id % 4 = 3 THEN NULL
           |       ELSE CAST(doc_id % 1079 + 1 AS INT) END AS img_height
           |FROM documents""".stripMargin))

  /** q205 — REAL PNG PIXEL decode
    * ([[graft.operators.PngCodec]] + `Multimodal.decodePixels`): the
    * last simulated codec seam closed for PNG. Per selected document
    * a REAL PNG is encoded executor-side (gradient pixels from
    * doc_id arithmetic, filter-0 scanlines, zlib-deflated IDAT,
    * CRC'd chunks); one in three payloads is truncated. decodePixels
    * then inflates + unfilters each payload and emits EXACT
    * per-channel byte sums. The oracle never sees a byte of PNG: it
    * recomputes every pixel value from the same arithmetic
    * (unnest(range) grids) — a green row proves inflate, unfilter,
    * channel packing and corrupt→NULL accounting are all exact. */
  val q205PngPixels = GQuery(
    "q205_png_pixels",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"lang")
        .where(pmod($"doc_id", lit(7)) === 0)
      val media = docs.as[(Long, String)].map { case (id, lang) =>
        val w = (id % 13).toInt + 4; val h = (id % 9).toInt + 3
        val data = Array.tabulate(w * h * 3) { i =>
          val px = i / 3; val c = i % 3
          val x = px % w; val y = px / w
          ((x * 7 + y * 13 + c * 31 + id) % 256).toByte
        }
        val png = graft.operators.PngCodec.encode(w, h, 3, data)
        (id, lang, if (id % 3 == 0) png.take(20) else png)
      }.toDF("doc_id", "lang", "payload")
      Multimodal.decodePixels(media, "payload")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_imgs"),
          count($"px_width").as("n_decoded"),
          sum($"px_width").cast("long").as("sum_w"),
          sum($"px_height").cast("long").as("sum_h"),
          sum($"px_sum0").as("s0"),
          sum($"px_sum1").as("s1"),
          sum($"px_sum2").as("s2"))
        .orderBy($"lang")
    },
    Some("""WITH docs AS (
           |  SELECT doc_id, lang, (doc_id % 13) + 4 AS w, (doc_id % 9) + 3 AS h
           |  FROM documents WHERE doc_id % 7 = 0),
           |base AS (
           |  SELECT lang, count(*) AS n_imgs,
           |         count(*) FILTER (WHERE doc_id % 3 <> 0) AS n_decoded,
           |         CAST(sum(w) FILTER (WHERE doc_id % 3 <> 0) AS BIGINT) AS sum_w,
           |         CAST(sum(h) FILTER (WHERE doc_id % 3 <> 0) AS BIGINT) AS sum_h
           |  FROM docs GROUP BY lang),
           |xs AS (SELECT doc_id, lang, h, unnest(range(w)) AS x
           |       FROM docs WHERE doc_id % 3 <> 0),
           |xy AS (SELECT doc_id, lang, x, unnest(range(h)) AS y FROM xs),
           |px AS (SELECT lang,
           |         CAST(sum((x*7 + y*13 + doc_id) % 256) AS BIGINT) AS s0,
           |         CAST(sum((x*7 + y*13 + 31 + doc_id) % 256) AS BIGINT) AS s1,
           |         CAST(sum((x*7 + y*13 + 62 + doc_id) % 256) AS BIGINT) AS s2
           |       FROM xy GROUP BY lang)
           |SELECT lang, n_imgs, n_decoded, sum_w, sum_h, s0, s1, s2
           |FROM base LEFT JOIN px USING (lang) ORDER BY lang""".stripMargin))

  /** q211 — GIF pixel decode, REAL ([[graft.operators.GifCodec]] +
    * [[Multimodal.decodePixels]]): the q205 pattern with the OTHER
    * pure-JVM codec — per-document GIF payloads built from arithmetic
    * (16-color palette, cycling pixel indexes), actually LZW-encoded
    * and re-decoded through the palette; every 3rd payload truncated
    * to prove corrupt→NULL. The oracle reproduces the per-channel
    * byte sums from the same arithmetic, so a green row pins the LZW
    * round trip, palette resolution and the null accounting in one
    * hash. (q213 then closed the JPEG tier too — all three image
    * formats decode for real.) */
  val q211GifPixels = GQuery(
    "q211_gif_pixels",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"lang")
        .where(pmod($"doc_id", lit(7)) === 0)
      val pal = Array.tabulate(16 * 3) { j =>
        val i = j / 3
        (j % 3 match {
          case 0 => i * 7 % 256
          case 1 => i * 31 % 256
          case 2 => 255 - i
        }).toByte
      }
      val media = docs.as[(Long, String)].map { case (id, lang) =>
        val w = (id % 11).toInt + 3; val h = (id % 6).toInt + 2
        val idxs = Array.tabulate(w * h)(p => ((p + id) % 16).toByte)
        val gif = graft.operators.GifCodec.encode(w, h, pal, idxs)
        (id, lang, if (id % 3 == 0) gif.take(15) else gif)
      }.toDF("doc_id", "lang", "payload")
      Multimodal.decodePixels(media, "payload")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_imgs"),
          count($"px_width").as("n_decoded"),
          sum($"px_width").cast("long").as("sum_w"),
          sum($"px_sum0").as("s0"),
          sum($"px_sum1").as("s1"),
          sum($"px_sum2").as("s2"))
        .orderBy($"lang")
    },
    Some("""WITH docs AS (
           |  SELECT doc_id, lang, (doc_id % 11) + 3 AS w, (doc_id % 6) + 2 AS h
           |  FROM documents WHERE doc_id % 7 = 0),
           |base AS (
           |  SELECT lang, count(*) AS n_imgs,
           |         count(*) FILTER (WHERE doc_id % 3 <> 0) AS n_decoded,
           |         CAST(sum(w) FILTER (WHERE doc_id % 3 <> 0) AS BIGINT) AS sum_w
           |  FROM docs GROUP BY lang),
           |xs AS (SELECT doc_id, lang, unnest(range(w * h)) AS p
           |       FROM docs WHERE doc_id % 3 <> 0),
           |px AS (SELECT lang,
           |         CAST(sum(((p + doc_id) % 16) * 7 % 256) AS BIGINT) AS s0,
           |         CAST(sum(((p + doc_id) % 16) * 31 % 256) AS BIGINT) AS s1,
           |         CAST(sum(255 - ((p + doc_id) % 16)) AS BIGINT) AS s2
           |       FROM xs GROUP BY lang)
           |SELECT lang, n_imgs, n_decoded, sum_w, s0, s1, s2
           |FROM base LEFT JOIN px USING (lang) ORDER BY lang""".stripMargin))

  /** q214 — MP4 container metadata, REAL ([[graft.operators.Mp4Meta]]
    * + [[Multimodal.decodeVideoMeta]]): the video modality's
    * curation-tier facts parsed straight from ISO BMFF boxes —
    * per-document MP4s built from arithmetic (timescale, duration,
    * track layout, 16.16 pixel dims), box-walked back, every 5th
    * payload truncated to pin corrupt→NULL. The oracle recomputes
    * duration-ms scaling, resolution sums and track counts; a green
    * row is what a duration-cap / resolution-floor curation filter
    * needs to trust the parser at 100 TB. Frame decode stays the one
    * documented media seam. */
  val q214VideoMeta = GQuery(
    "q214_video_meta",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"lang")
        .where(pmod($"doc_id", lit(8)) === 0)
      val media = docs.as[(Long, String)].map { case (id, lang) =>
        val k = (id % 5).toInt + 1
        val mp4 = graft.operators.Mp4Meta.build(
          brand = if (id % 2 == 0) "mp42" else "isom",
          timescale = 90000L,
          duration = ((id % 300) + 30) * 90000L,
          videoDims = Seq((k * 320, k * 180)),
          audioTracks = (id % 3).toInt)
        (id, lang, if (id % 5 == 0) mp4.take(40) else mp4)
      }.toDF("doc_id", "lang", "payload")
      Multimodal.decodeVideoMeta(media, "payload")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_vids"),
          count($"vid_brand").as("n_parsed"),
          sum($"vid_duration_ms").as("sum_ms"),
          sum($"vid_width").cast("long").as("sum_w"),
          sum($"vid_n_audio").cast("long").as("sum_audio"),
          sum(when($"vid_brand" === "mp42", 1).otherwise(0)).as("n_mp42"))
        .orderBy($"lang")
    },
    Some("""WITH docs AS (
           |  SELECT doc_id, lang, (doc_id % 5) + 1 AS k,
           |         ((doc_id % 300) + 30) * 1000 AS ms, doc_id % 3 AS naud
           |  FROM documents WHERE doc_id % 8 = 0)
           |SELECT lang, count(*) AS n_vids,
           |       count(*) FILTER (WHERE doc_id % 5 <> 0) AS n_parsed,
           |       CAST(sum(ms) FILTER (WHERE doc_id % 5 <> 0) AS BIGINT) AS sum_ms,
           |       CAST(sum(k * 320) FILTER (WHERE doc_id % 5 <> 0) AS BIGINT) AS sum_w,
           |       CAST(sum(naud) FILTER (WHERE doc_id % 5 <> 0) AS BIGINT) AS sum_audio,
           |       CAST(count(*) FILTER (WHERE doc_id % 5 <> 0 AND doc_id % 2 = 0) AS BIGINT)
           |         AS n_mp42
           |FROM docs GROUP BY lang ORDER BY lang""".stripMargin))

  /** q213 — baseline JPEG pixel decode, REAL
    * ([[graft.operators.JpegCodec]]): the LAST image seam closed —
    * per-document grayscale JPEGs of constant 8×8 blocks (values from
    * arithmetic), actually FDCT-quantized, Annex-K-Huffman-entropy-
    * coded, and decoded back through the full baseline pipeline
    * (marker walk, Huffman, dequantize, IDCT). Constant blocks carry
    * exactly one integer DC coefficient under all-ones quantization,
    * so the LOSSY pipeline is bit-exact for them and the oracle can
    * recompute every pixel sum arithmetically; every 3rd payload is
    * truncated to pin corrupt→NULL. Round 11: every other document
    * encodes PROGRESSIVE (SOF2, the 4-scan successive-approximation
    * script of [[graft.operators.JpegCodec.encodeProgressive]]) — the
    * majority class of web-scraped JPEGs — and both modes must decode
    * to the SAME arithmetic the one oracle recomputes. With q205 (PNG)
    * and q211 (GIF), all three image formats decode for real. */
  val q213JpegPixels = GQuery(
    "q213_jpeg_pixels",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"lang")
        .where(pmod($"doc_id", lit(6)) === 0)
      val media = docs.as[(Long, String)].map { case (id, lang) =>
        val bw = (id % 4).toInt + 2; val bh = (id % 3).toInt + 1
        val w = bw * 8; val h = bh * 8
        val g = new Array[Byte](w * h)
        for (by <- 0 until bh; bx <- 0 until bw; y <- 0 until 8; x <- 0 until 8)
          g((by * 8 + y) * w + bx * 8 + x) =
            ((bx * 37 + by * 91 + id) % 256).toByte
        val jpg =
          if ((id / 6) % 2 == 0)
            graft.operators.JpegCodec.encodeProgressive(w, h, Seq(g))
          else graft.operators.JpegCodec.encodeGray(w, h, g)
        // truncation keys off the RANK among selected ids (id/6) — the
        // ids themselves are all multiples of 6, so `id % 3 == 0` would
        // be uniformly true and truncate EVERY payload (a vacuously
        // green query that decodes nothing)
        (id, lang, if ((id / 6) % 3 == 0) jpg.take(25) else jpg)
      }.toDF("doc_id", "lang", "payload")
      Multimodal.decodePixels(media, "payload")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_imgs"),
          count($"px_width").as("n_decoded"),
          sum($"px_width").cast("long").as("sum_w"),
          sum($"px_height").cast("long").as("sum_h"),
          sum($"px_sum0").as("s0"))
        .orderBy($"lang")
    },
    Some("""WITH docs AS (
           |  SELECT doc_id, lang, (doc_id % 4) + 2 AS bw, (doc_id % 3) + 1 AS bh,
           |         (doc_id // 6) % 3 AS trunc
           |  FROM documents WHERE doc_id % 6 = 0),
           |base AS (
           |  SELECT lang, count(*) AS n_imgs,
           |         count(*) FILTER (WHERE trunc <> 0) AS n_decoded,
           |         CAST(sum(bw * 8) FILTER (WHERE trunc <> 0) AS BIGINT) AS sum_w,
           |         CAST(sum(bh * 8) FILTER (WHERE trunc <> 0) AS BIGINT) AS sum_h
           |  FROM docs GROUP BY lang),
           |bs AS (SELECT doc_id, lang, bh, unnest(range(bw)) AS bx
           |       FROM docs WHERE trunc <> 0),
           |bxy AS (SELECT doc_id, lang, bx, unnest(range(bh)) AS by FROM bs),
           |px AS (SELECT lang,
           |         CAST(sum(64 * ((bx * 37 + by * 91 + doc_id) % 256)) AS BIGINT) AS s0
           |       FROM bxy GROUP BY lang)
           |SELECT lang, n_imgs, n_decoded, sum_w, sum_h, s0
           |FROM base LEFT JOIN px USING (lang) ORDER BY lang""".stripMargin))

  /** q212 — WAV audio decode, REAL ([[graft.operators.WavCodec]] +
    * [[Multimodal.decodeAudio]]): per-document stereo 16-bit PCM
    * payloads built from arithmetic, RIFF-encoded and decoded back;
    * every 4th payload truncated to prove corrupt→NULL. The output
    * aggregates format facts plus EXACT per-channel sample sums and
    * sums-of-squares (the mean/RMS primitives) per lang, and the
    * oracle reproduces all of it arithmetically — audio joins images
    * as a modality whose bytes graft actually decodes, not just
    * carries. */
  val q212WavAudio = GQuery(
    "q212_wav_audio",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"lang")
        .where(pmod($"doc_id", lit(5)) === 0)
      val media = docs.as[(Long, String)].map { case (id, lang) =>
        val frames = (id % 50).toInt + 20
        val samples = Array.tabulate(frames * 2) { i =>
          val t = i / 2; val c = i % 2
          ((t * 13 + c * 7 + id) % 2001).toInt - 1000
        }
        val wav = graft.operators.WavCodec.encode(16000, 2, 16, samples)
        (id, lang, if (id % 4 == 0) wav.take(30) else wav)
      }.toDF("doc_id", "lang", "payload")
      Multimodal.decodeAudio(media, "payload")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_clips"),
          count($"au_rate").as("n_decoded"),
          sum($"au_frames").cast("long").as("sum_frames"),
          sum($"au_sum0").as("s0"),
          sum($"au_sumsq0").as("sq0"),
          sum($"au_sum1").as("s1"),
          sum($"au_sumsq1").as("sq1"))
        .orderBy($"lang")
    },
    Some("""WITH docs AS (
           |  SELECT doc_id, lang, (doc_id % 50) + 20 AS frames
           |  FROM documents WHERE doc_id % 5 = 0),
           |base AS (
           |  SELECT lang, count(*) AS n_clips,
           |         count(*) FILTER (WHERE doc_id % 4 <> 0) AS n_decoded,
           |         CAST(sum(frames) FILTER (WHERE doc_id % 4 <> 0) AS BIGINT)
           |           AS sum_frames
           |  FROM docs GROUP BY lang),
           |ts AS (SELECT doc_id, lang, unnest(range(frames)) AS t
           |       FROM docs WHERE doc_id % 4 <> 0),
           |vals AS (SELECT lang,
           |           (t * 13 + doc_id) % 2001 - 1000 AS v0,
           |           (t * 13 + 7 + doc_id) % 2001 - 1000 AS v1
           |         FROM ts),
           |px AS (SELECT lang,
           |         CAST(sum(v0) AS BIGINT) AS s0, CAST(sum(v0 * v0) AS BIGINT) AS sq0,
           |         CAST(sum(v1) AS BIGINT) AS s1, CAST(sum(v1 * v1) AS BIGINT) AS sq1
           |       FROM vals GROUP BY lang)
           |SELECT lang, n_clips, n_decoded, sum_frames, s0, sq0, s1, sq1
           |FROM base LEFT JOIN px USING (lang) ORDER BY lang""".stripMargin))

  /** Batch twin of the streaming tumbling-window aggregation
    * (Streams.tumblingCounts runs unchanged on a stream with watermark). */
  val q51WindowTumbling = GQuery(
    "q51_window_tumbling",
    (s, d) => Streams.tumblingCounts(Tables.events(s, d)),
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
           |FROM events GROUP BY window_start, event_type""".stripMargin),
    benchmark = true)

  /** F7/F8-style typed JSON parse: from_json into a struct, field
    * access, aggregate — the parse-once pattern SURVEY §7.4 #5 calls
    * for (the reference re-parses JSON strings at ≥6 sites). */
  val q52NestedJson = GQuery(
    "q52_nested_json",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("k", from_json($"props", lit("k INT")).getField("k").cast("long"))
        .withColumn("k_mod", $"k" % 10)
        .groupBy($"k_mod").agg(count(lit(1)).as("n"), sum($"k").as("k_total"))
    },
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           |  count(*) AS n,
           |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total
           |FROM events GROUP BY k_mod""".stripMargin))

  /** F9-style array-of-struct extraction: JSON array → typed structs →
    * explode → aggregate (the bridge-construction pattern, J4). */
  val q53NestedExplode = GQuery(
    "q53_nested_explode",
    (s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("arr_json",
          format_string("""[{"id": %d}, {"id": %d}]""", $"user_id", $"user_id" * 2))
        .withColumn("item", explode(from_json($"arr_json", lit("array<struct<id: bigint>>"))))
        .groupBy($"event_type")
        .agg(sum($"item.id").as("id_total"), count(lit(1)).as("n_items"))
    },
    Some("""SELECT event_type, CAST(sum(id) AS BIGINT) AS id_total, count(*) AS n_items
           |FROM (SELECT event_type,
           |        unnest(list_transform(
           |          from_json(printf('[{"id": %d}, {"id": %d}]', user_id, user_id * 2),
           |                    '[{"id": "BIGINT"}]'),
           |          x -> x.id)) AS id
           |      FROM events)
           |GROUP BY event_type""".stripMargin))

  /** J2 seeded-catalog lookup with default handling: classified docs
    * left-join the literal catalog dim; missing categories coalesce to
    * a real default (fixing the reference's null 'Other Gaming' lookup,
    * loader_NeonDB.py:566). */
  val q54SeedCatalog = GQuery(
    "q54_seed_catalog",
    (s, d) => {
      import s.implicits._
      val rules = Seq("stream" -> "Streaming", "window" -> "Windowing",
        "join" -> "Joins", "group" -> "Aggregation")
      val docs = Tables.documents(s, d)
        .withColumn("category", Classify.keywordClassifier($"text", rules, "General"))
      docs.join(broadcast(StarSchema.seedCatalog(s)), Seq("category"), "left")
        .groupBy(coalesce($"genre", lit("unknown")).as("genre"))
        .agg(count(lit(1)).as("n_docs"), countDistinct($"category").as("n_categories"))
    },
    Some {
      val rules = Seq("stream" -> "Streaming", "window" -> "Windowing",
        "join" -> "Joins", "group" -> "Aggregation")
      val values = StarSchema.CategoryCatalog
        .map { case (c, g) => s"('$c', '$g')" }.mkString(", ")
      s"""WITH cat AS (SELECT * FROM (VALUES $values) t(category, genre)),
         |docs AS (SELECT ${Classify.keywordClassifierSql("text", rules, "General")} AS category
         |         FROM documents)
         |SELECT coalesce(genre, 'unknown') AS genre, count(*) AS n_docs,
         |  count(DISTINCT category) AS n_categories
         |FROM docs LEFT JOIN cat USING (category)
         |GROUP BY 1""".stripMargin
    })

  /** Tag dimension + bridge resolution: the exploded-values dim keyed
    * and joined back through the N:M bridge (dim_tag_gaming +
    * fact_evento_tag_gaming, loader_NeonDB.py:431-455, :519-551). */
  val q65TagBridge = GQuery(
    "q65_tag_bridge",
    (s, d) => {
      import s.implicits._
      val star = StarSchema.build(s, d)
      star("bridge_part_tag")
        .join(graft.operators.Joins.maybeBroadcast(star("dim_tag")), Seq("tag_id"))
        .groupBy($"tag_id", $"tag_nombre")
        .agg(count(lit(1)).as("n_parts"))
    },
    Some(s"""WITH $TagCtes
            |SELECT tag_id, tag_nombre, count(*) AS n_parts
            |FROM ptag JOIN dim_tag USING (tag_nombre)
            |GROUP BY tag_id, tag_nombre""".stripMargin))

  /** The order↔part N:M bridge materialized in full — distinct FK pairs
    * from the genuinely many-to-many lineitem relation, both sides
    * validated (fact_mercado_evento_gaming, loader_NeonDB.py:457-517). */
  val q66BridgeOrderPart = GQuery(
    "q66_bridge_order_part",
    (s, d) => StarSchema.build(s, d)("bridge_order_part"),
    Some("""SELECT DISTINCT l_orderkey AS orderkey, l_partkey AS partkey
           |FROM lineitem
           |WHERE l_orderkey IN (SELECT o_orderkey FROM orders)
           |  AND l_partkey IN (SELECT p_partkey FROM part)""".stripMargin))

  /** The multi-measure metrics fact materialized in full: fecha FK via
    * broadcast lookup + 7 measures, raw IEEE arithmetic on the derived
    * three (fact_metricas_gaming, loader_NeonDB.py:608-652). */
  val q67FactMetricas = GQuery(
    "q67_fact_metricas",
    (s, d) => StarSchema.build(s, d)("fact_metricas"),
    Some(s"""WITH $DimFechaCte
            |SELECT l_orderkey AS orderkey, l_linenumber AS linenumber, fecha_id,
            |  l_partkey AS partkey,
            |  l_quantity AS cantidad, l_extendedprice AS precio_ext,
            |  l_discount AS descuento, l_tax AS impuesto,
            |  l_extendedprice * (1.0 - l_discount) AS precio_neto,
            |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS cargo_total,
            |  l_extendedprice * l_discount AS monto_descuento
            |FROM lineitem
            |JOIN dim_fecha ON CAST(l_shipdate AS DATE) = fecha""".stripMargin))

  /** Gold-layer rollup through both bridge hops: metrics fact →
    * part↔tag bridge → tag dim. The bridge and dim are part-sized →
    * both broadcast; the fact never shuffles before the aggregate. */
  val q68TagRevenue = GQuery(
    "q68_tag_revenue",
    (s, d) => {
      import s.implicits._
      val star = StarSchema.build(s, d)
      star("fact_metricas")
        .join(graft.operators.Joins.maybeBroadcast(
            star("bridge_part_tag").withColumnRenamed("p_partkey", "partkey")),
          Seq("partkey"))
        .join(graft.operators.Joins.maybeBroadcast(star("dim_tag")), Seq("tag_id"))
        .groupBy($"tag_nombre")
        .agg(
          round(sum($"precio_neto"), 2).as("revenue"),
          round(sum($"cargo_total"), 2).as("charge"),
          round(sum($"cantidad"), 2).as("total_qty"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""WITH $TagCtes
            |SELECT tag_nombre,
            |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
            |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS charge,
            |  round(sum(l_quantity), 2) AS total_qty, count(*) AS n_lines
            |FROM lineitem
            |JOIN ptag ON l_partkey = p_partkey
            |JOIN dim_tag USING (tag_nombre)
            |GROUP BY tag_nombre""".stripMargin),
    benchmark = true)

  /** q243 — PERCEPTUAL image near-dup (dHash + Hamming-LSH banding;
    * [[Multimodal.dhashImages]] + [[graft.operators.Dedup
    * .hammingNearDupPairs]]): per document, TWO real images of the
    * same 8×9-cell luma pattern — an 18×16 grayscale PNG (2×2 blocks)
    * and its RESIZED, RE-ENCODED 9×8 GIF copy (different bytes,
    * different format, different dimensions). Byte-level dedup can
    * only pair bit-identical payloads; the dHash tier pairs the
    * copies because the pooled luma grid — hence the 64-bit gradient
    * hash — is identical by construction. Every 4th document's
    * payloads are truncated (corrupt → NULL accounting), and the
    * capped run (maxBucketSize 8) shows the hot-bucket valve's
    * dropped-work ledger. The oracle recomputes EVERYTHING from the
    * construction arithmetic — dHash bits, band slices, bucket caps —
    * without decoding a byte, so the decode→pool→hash→band pipeline
    * is pinned end to end. */
  /** q243/q245's shared image corpus: per selected document, an 18×16
    * grayscale PNG (2×2 blocks of the seed pattern) and its RESIZED
    * 9×8 GIF re-encode; every 4th document's payloads truncated. */
  private def imageCorpus(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import graft.operators.{GifCodec, PngCodec}
    val docs = Tables.documents(s, d).select($"doc_id").as[Long]
      .filter(id => id % 7 == 0 && id < 20000)
    val grayPalette = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    docs.flatMap { id =>
      def pat(r: Int, c: Int): Int = ((id * 37 + r * 11 + c * 7) % 256).toInt
      val gA = Array.tabulate(18 * 16) { i =>
        val y = i / 18; val x = i % 18; pat(y / 2, x / 2).toByte
      }
      val png = PngCodec.encode(18, 16, 1, gA)
      val gB = Array.tabulate(9 * 8)(i => pat(i / 9, i % 9).toByte)
      val gif = GifCodec.encode(9, 8, grayPalette, gB)
      val corrupt = (id / 7) % 4 == 0
      Seq((id, if (corrupt) png.take(10) else png),
        (id + 1000000L, if (corrupt) gif.take(10) else gif))
    }.toDF("img_id", "payload")
  }

  /** The oracle's arithmetic twin of [[imageCorpus]] + dHash: CTEs
    * ending in `hrows(img_id, v, m, dh)` — decodable image rows with
    * their bit-string hash recomputed from the construction pattern. */
  private val ImageHrowsSql =
    """ids AS (
      |  SELECT doc_id AS id FROM documents
      |  WHERE doc_id % 7 = 0 AND doc_id < 20000),
      |imgs AS (
      |  SELECT id, v.v, id + v.v * 1000000 AS img_id,
      |         ((id // 7) % 4 = 0) AS corrupt
      |  FROM ids, (VALUES (0), (1)) AS v(v)),
      |rows_ok AS (SELECT * FROM imgs WHERE NOT corrupt),
      |bitsrc AS (
      |  SELECT i.id, r.r, c.c,
      |    CASE WHEN ((i.id*37 + r.r*11 + c.c*7) % 256) >
      |              ((i.id*37 + r.r*11 + (c.c+1)*7) % 256)
      |         THEN '1' ELSE '0' END AS b
      |  FROM ids i, range(8) AS r(r), range(8) AS c(c)),
      |dh AS (SELECT id, string_agg(b, '' ORDER BY r, c) AS dh
      |       FROM bitsrc GROUP BY id),
      |hrows AS (SELECT o.img_id, o.v, o.id % 256 AS m, dh.dh
      |          FROM rows_ok o JOIN dh ON o.id = dh.id)""".stripMargin

  val q243ImageNearDup = GQuery(
    "q243_image_neardup",
    (s, d) => {
      import s.implicits._
      import graft.operators.Dedup
      val media = imageCorpus(s, d)
      val hashed = Multimodal.dhashImages(media, "payload")
      val ok = hashed.where($"dhash".isNotNull).persist()
      val nImgs = media.count()
      val nDecoded = ok.count()
      val nPairs = Dedup.hammingNearDupPairs(ok, "img_id", "dhash",
        maxHamming = 0, bands = 4).count()
      val nBytePairs = ok.groupBy(md5($"payload")).agg(count(lit(1)).as("k"))
        .agg(coalesce(sum($"k" * ($"k" - 1) / 2), lit(0L)).cast("long"))
        .as[Long].head()
      val nPairsCapped = Dedup.hammingNearDupPairs(ok, "img_id", "dhash",
        maxHamming = 0, bands = 4, maxBucketSize = 8).count()
      val nDroppedBuckets = Dedup.hammingDroppedBuckets(ok, "img_id", "dhash",
        bands = 4, maxBucketSize = 8).count()
      ok.unpersist()
      Seq((nImgs, nDecoded, nPairs, nBytePairs, nPairsCapped, nDroppedBuckets))
        .toDF("n_imgs", "n_decoded", "n_dhash_pairs", "n_byte_pairs",
          "n_pairs_capped", "n_dropped_buckets")
    },
    Some(s"""WITH $ImageHrowsSql,
           |grp AS (SELECT dh, count(*) AS k FROM hrows GROUP BY dh),
           |byteg AS (SELECT v, m, count(*) AS k FROM hrows GROUP BY v, m),
           |bandrows AS (
           |  SELECT img_id, dh, b.b AS band, substr(dh, b.b*16 + 1, 16) AS slice
           |  FROM hrows, range(4) AS b(b)),
           |bucket AS (SELECT band, slice, count(*) AS bsz
           |           FROM bandrows GROUP BY band, slice),
           |surv AS (SELECT br.img_id, br.dh, br.band, br.slice FROM bandrows br
           |         JOIN bucket USING (band, slice) WHERE bsz <= 8),
           |capped AS (
           |  SELECT DISTINCT a.img_id AS ia, b.img_id AS ib
           |  FROM surv a JOIN surv b
           |    ON a.band = b.band AND a.slice = b.slice AND a.img_id < b.img_id
           |  WHERE a.dh = b.dh)
           |SELECT
           |  (SELECT count(*) FROM imgs) AS n_imgs,
           |  (SELECT count(*) FROM rows_ok) AS n_decoded,
           |  CAST((SELECT coalesce(sum(k*(k-1)//2), 0) FROM grp) AS BIGINT)
           |    AS n_dhash_pairs,
           |  CAST((SELECT coalesce(sum(k*(k-1)//2), 0) FROM byteg) AS BIGINT)
           |    AS n_byte_pairs,
           |  (SELECT count(*) FROM capped) AS n_pairs_capped,
           |  (SELECT count(*) FROM bucket WHERE bsz > 8) AS n_dropped_buckets""".stripMargin))

  /** q245 — transitive IMAGE dup groups + keep policy: the multimodal
    * twin of q83. dHash pairs (Hamming 0, banded) feed the pointer-
    * jumping [[graft.operators.Dedup.connectedComponents]]; each
    * component keeps its smallest img_id and drops the rest — the
    * end-to-end image dedup decision (find → group → keep-one) with
    * the same candidate-bounded machinery as the text tier. At
    * Hamming 0 the components are exactly the dHash equality classes,
    * so the oracle derives them from the construction arithmetic and
    * pins the whole Spark composition (decode → hash → band-join →
    * CC → keep) against plain grouping. */
  val q245ImageDedupGroups = GQuery(
    "q245_image_dedup_groups",
    (s, d) => {
      import s.implicits._
      import graft.operators.Dedup
      val hashed = Multimodal.dhashImages(imageCorpus(s, d), "payload")
        .where($"dhash".isNotNull)
      val pairs = Dedup.hammingNearDupPairs(hashed, "img_id", "dhash",
        maxHamming = 0, bands = 4)
      val labels = Dedup.connectedComponents(pairs)
      val groups = labels.groupBy($"label").agg(count(lit(1)).as("k"))
      groups.agg(
        count(lit(1)).cast("long").as("n_groups"),
        sum($"k").cast("long").as("n_members"),
        (sum($"k") - count(lit(1))).cast("long").as("n_dropped"),
        sum($"label").cast("long").as("sum_keep_ids"))
    },
    Some(s"""WITH $ImageHrowsSql,
           |g AS (SELECT dh, count(*) AS k, min(img_id) AS lab
           |      FROM hrows GROUP BY dh HAVING count(*) >= 2)
           |SELECT count(*) AS n_groups,
           |  CAST(sum(k) AS BIGINT) AS n_members,
           |  CAST(sum(k) - count(*) AS BIGINT) AS n_dropped,
           |  CAST(sum(lab) AS BIGINT) AS sum_keep_ids
           |FROM g""".stripMargin))

  /** q246 — Hamming-RADIUS recall, oracle-pinned end to end: the
    * pigeonhole guarantee is [[graft.operators.Dedup
    * .hammingNearDupPairs]]'s selling point (q243/q245 exercise only
    * Hamming 0), so this corpus PLANTS images at exact dHash distances
    * 1, 2 and 3 from a base image by flipping pooled LEFTMOST-column
    * cells (a column-0 cell feeds exactly ONE gradient bit, so each
    * flip moves the hash by at most one deterministic bit). The
    * operator runs at `maxHamming = 2, bands = 4` (radius < bands →
    * deterministic recall) and at radius 1; the oracle recomputes
    * every variant's 64-bit hash from the construction arithmetic and
    * takes TRUE all-pairs `bit_count(xor) <= radius` as ground truth —
    * so the banded join's recall, the exact-verify rejection of the
    * distance-3 plants, and the pair identities (sum of ids) are all
    * pinned against an oracle that never bands. */
  private def flippedImageCorpus(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import graft.operators.PngCodec
    val docs = Tables.documents(s, d).select($"doc_id").as[Long]
      .filter(id => id % 7 == 0 && id < 20000)
    docs.flatMap { id =>
      def pat(r: Int, c: Int): Int = ((id * 37 + r * 11 + c * 7) % 256).toInt
      // flipping grid cell (r, 0) toward 0/255 reverses (or pins, when
      // the right neighbor is saturated — the oracle mirrors the CASE)
      // the single gradient bit (r, 0)
      def flipVal(r: Int): Int = if (pat(r, 0) > pat(r, 1)) 0 else 255
      val flipRows = Seq(
        Seq.empty[Int],                                        // v0: base
        Seq((id % 8).toInt),                                   // v1: 1 bit
        Seq((id % 8).toInt, ((id + 3) % 8).toInt),             // v2: 2 bits
        Seq((id % 8).toInt, ((id + 3) % 8).toInt, ((id + 5) % 8).toInt)) // v3: 3
      flipRows.zipWithIndex.map { case (rows, v) =>
        val g = Array.tabulate(18 * 16) { i =>
          val gr = (i / 18) / 2; val gc = (i % 18) / 2
          (if (gc == 0 && rows.contains(gr)) flipVal(gr) else pat(gr, gc)).toByte
        }
        (id + v * 1000000L, PngCodec.encode(18, 16, 1, g))
      }
    }.toDF("img_id", "payload")
  }

  val q246HammingRecall = GQuery(
    "q246_image_hamming_recall",
    (s, d) => {
      import s.implicits._
      import graft.operators.Dedup
      val hashed = Multimodal.dhashImages(flippedImageCorpus(s, d), "payload")
        .where($"dhash".isNotNull).persist()
      val ha = hashed.select($"img_id".as("id_a"), $"dhash".as("__ha"))
      val hb = hashed.select($"img_id".as("id_b"), $"dhash".as("__hb"))
      val pairs2 = Dedup.hammingNearDupPairs(hashed, "img_id", "dhash",
        maxHamming = 2, bands = 4)
        .join(ha, "id_a").join(hb, "id_b")
        .withColumn("dist", bit_count($"__ha".bitwiseXOR($"__hb")))
      val nPairs1 = Dedup.hammingNearDupPairs(hashed, "img_id", "dhash",
        maxHamming = 1, bands = 4).count()
      val nImgs = hashed.count()
      val agg = pairs2.agg(
        count(lit(1)).cast("long"),
        count(when($"dist" === 0, 1)).cast("long"),
        count(when($"dist" === 1, 1)).cast("long"),
        count(when($"dist" === 2, 1)).cast("long"),
        coalesce(sum($"id_a" + $"id_b"), lit(0L)).cast("long")).collect()(0)
      hashed.unpersist()
      Seq((nImgs, agg.getLong(0), nPairs1, agg.getLong(1), agg.getLong(2),
        agg.getLong(3), agg.getLong(4)))
        .toDF("n_imgs", "n_pairs_h2", "n_pairs_h1", "n_d0", "n_d1", "n_d2",
          "sum_pair_ids")
    },
    Some("""WITH ids AS (
           |  SELECT doc_id AS id FROM documents
           |  WHERE doc_id % 7 = 0 AND doc_id < 20000),
           |gval AS (
           |  SELECT i.id, v.v, r.r, c.c,
           |    CASE WHEN c.c = 0 AND (
           |           (v.v >= 1 AND r.r = i.id % 8) OR
           |           (v.v >= 2 AND r.r = (i.id + 3) % 8) OR
           |           (v.v >= 3 AND r.r = (i.id + 5) % 8))
           |      THEN CASE WHEN ((i.id*37 + r.r*11) % 256) >
           |                     ((i.id*37 + r.r*11 + 7) % 256)
           |                THEN 0 ELSE 255 END
           |      ELSE (i.id*37 + r.r*11 + c.c*7) % 256 END AS g
           |  FROM ids i, (VALUES (0),(1),(2),(3)) AS v(v),
           |       range(8) AS r(r), range(9) AS c(c)),
           |hashes AS (
           |  -- bit 63 lands as -2^63 in HUGEINT space (DuckDB refuses
           |  -- the overflowing 1<<63), so the BIGINT cast reproduces
           |  -- the exact two's-complement pattern
           |  SELECT a.id, a.v, a.id + a.v * 1000000 AS img_id,
           |    CAST(sum(CASE WHEN a.g > b.g THEN
           |        CASE WHEN a.r*8 + a.c = 63 THEN (-9223372036854775808)::HUGEINT
           |             ELSE (1::BIGINT << CAST(a.r*8 + a.c AS INT))::HUGEINT END
           |      ELSE 0::HUGEINT END) AS BIGINT) AS h
           |  FROM gval a JOIN gval b
           |    ON a.id = b.id AND a.v = b.v AND a.r = b.r AND b.c = a.c + 1
           |  WHERE a.c < 8
           |  GROUP BY a.id, a.v),
           |pairs AS (
           |  SELECT a.img_id AS ia, b.img_id AS ib,
           |         bit_count(xor(a.h, b.h)) AS d
           |  FROM hashes a JOIN hashes b ON a.img_id < b.img_id
           |  WHERE bit_count(xor(a.h, b.h)) <= 2)
           |SELECT
           |  (SELECT count(*) FROM hashes) AS n_imgs,
           |  (SELECT count(*) FROM pairs) AS n_pairs_h2,
           |  (SELECT count(*) FROM pairs WHERE d <= 1) AS n_pairs_h1,
           |  (SELECT count(*) FROM pairs WHERE d = 0) AS n_d0,
           |  (SELECT count(*) FROM pairs WHERE d = 1) AS n_d1,
           |  (SELECT count(*) FROM pairs WHERE d = 2) AS n_d2,
           |  CAST((SELECT coalesce(sum(ia + ib), 0) FROM pairs) AS BIGINT)
           |    AS sum_pair_ids""".stripMargin))

  /** q249's clip corpus: per selected document, FOUR 4-frame clips of
    * real PNG frames — v0 the 9×8 original, v1 the same content
    * re-encoded at 2× resolution (per-frame dHash identical by
    * pooling), v2 with a single pooled-cell flip on frames 1 and 3
    * (per-frame distance ≤ 1 where the flip lands), v3 unrelated
    * content (seed id+999, never a selected id since 999 % 7 ≠ 0).
    * clip_id = doc_id·4 + variant. */
  private def clipCorpus(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import graft.operators.PngCodec
    val docs = Tables.documents(s, d).select($"doc_id").as[Long]
      .filter(id => id % 7 == 0 && id < 20000)
    docs.flatMap { id =>
      def pat(seed: Long, f: Int, r: Int, c: Int): Int =
        ((seed * 37 + f * 131 + r * 11 + c * 7) % 256).toInt
      (0 until 4).flatMap { f =>
        def base(r: Int, c: Int): Int = pat(id, f, r, c)
        val flipRow = ((id + f) % 8).toInt
        val flipVal = if (base(flipRow, 0) > base(flipRow, 1)) 0 else 255
        val v0 = Array.tabulate(9 * 8)(i => base(i / 9, i % 9).toByte)
        val v1 = Array.tabulate(18 * 16) { i =>
          val y = i / 18; val x = i % 18; base(y / 2, x / 2).toByte
        }
        val v2 = Array.tabulate(9 * 8) { i =>
          val r = i / 9; val c = i % 9
          (if (c == 0 && (f == 1 || f == 3) && r == flipRow) flipVal
           else base(r, c)).toByte
        }
        val v3 = Array.tabulate(9 * 8)(i => pat(id + 999, f, i / 9, i % 9).toByte)
        Seq((id * 4 + 0L, f, PngCodec.encode(9, 8, 1, v0)),
          (id * 4 + 1L, f, PngCodec.encode(18, 16, 1, v1)),
          (id * 4 + 2L, f, PngCodec.encode(9, 8, 1, v2)),
          (id * 4 + 3L, f, PngCodec.encode(9, 8, 1, v3)))
      }
    }.toDF("clip_id", "frame_idx", "payload")
  }

  /** q249 — VIDEO-CLIP perceptual near-dup ([[graft.operators.Dedup
    * .clipNearDupPairs]]): frame-sampled dHash sequences banded
    * per (frame_idx, slice), exact per-frame Hamming verify, clip
    * verdict by matched-frame count. The resolution-doubled copy
    * matches on every frame at radius 0; the flipped copy needs
    * radius 1 (or a 2-of-4 frame threshold at radius 0); unrelated
    * clips never pair. The oracle recomputes every frame hash from
    * the construction arithmetic and aggregates TRUE all-pairs
    * per-frame distances — banding recall, verify rejection and the
    * matched-frame thresholds are all pinned. */
  val q249ClipNearDup = GQuery(
    "q249_clip_neardup",
    (s, d) => {
      import s.implicits._
      import graft.operators.Dedup
      val hashed = Multimodal.dhashImages(clipCorpus(s, d), "payload")
        .where($"dhash".isNotNull).persist()
      val h1m4 = Dedup.clipNearDupPairs(hashed, "clip_id", "frame_idx",
        "dhash", maxHamming = 1, bands = 4, minMatchedFrames = 4).persist()
      val h0m2 = Dedup.clipNearDupPairs(hashed, "clip_id", "frame_idx",
        "dhash", maxHamming = 0, bands = 4, minMatchedFrames = 2).persist()
      val nClips = hashed.select($"clip_id").distinct().count()
      val a1 = h1m4.agg(count(lit(1)).cast("long"),
        coalesce(sum($"id_a" + $"id_b"), lit(0L)).cast("long")).collect()(0)
      val nH0m4 = h0m2.where($"matched_frames" === 4).count()
      val a0 = h0m2.agg(count(lit(1)).cast("long"),
        coalesce(sum($"matched_frames"), lit(0L)).cast("long")).collect()(0)
      hashed.unpersist(); h1m4.unpersist(); h0m2.unpersist()
      Seq((nClips, a1.getLong(0), a1.getLong(1), nH0m4, a0.getLong(0),
        a0.getLong(1)))
        .toDF("n_clips", "n_pairs_h1_m4", "sum_ids_h1_m4", "n_pairs_h0_m4",
          "n_pairs_h0_m2", "sum_matched_h0_m2")
    },
    Some("""WITH ids AS (
           |  SELECT doc_id AS id FROM documents
           |  WHERE doc_id % 7 = 0 AND doc_id < 20000),
           |gval AS (
           |  SELECT i.id, v.v, f.f, r.r, c.c,
           |    CASE WHEN c.c = 0 AND v.v = 2 AND (f.f = 1 OR f.f = 3)
           |              AND r.r = (i.id + f.f) % 8
           |      THEN CASE WHEN ((i.id*37 + f.f*131 + r.r*11) % 256) >
           |                     ((i.id*37 + f.f*131 + r.r*11 + 7) % 256)
           |                THEN 0 ELSE 255 END
           |      ELSE (CASE WHEN v.v = 3 THEN (i.id + 999)*37
           |                 ELSE i.id*37 END
           |            + f.f*131 + r.r*11 + c.c*7) % 256 END AS g
           |  FROM ids i, (VALUES (0),(1),(2),(3)) AS v(v),
           |       range(4) AS f(f), range(8) AS r(r), range(9) AS c(c)),
           |hashes AS (
           |  SELECT a.id, a.v, a.f, a.id*4 + a.v AS clip_id,
           |    CAST(sum(CASE WHEN a.g > b.g THEN
           |        CASE WHEN a.r*8 + a.c = 63 THEN (-9223372036854775808)::HUGEINT
           |             ELSE (1::BIGINT << CAST(a.r*8 + a.c AS INT))::HUGEINT END
           |      ELSE 0::HUGEINT END) AS BIGINT) AS h
           |  FROM gval a JOIN gval b
           |    ON a.id = b.id AND a.v = b.v AND a.f = b.f AND a.r = b.r
           |   AND b.c = a.c + 1
           |  WHERE a.c < 8
           |  GROUP BY a.id, a.v, a.f),
           |fp AS (
           |  SELECT a.clip_id AS ca, b.clip_id AS cb,
           |         bit_count(xor(a.h, b.h)) AS dist
           |  FROM hashes a JOIN hashes b
           |    ON a.f = b.f AND a.clip_id < b.clip_id),
           |pp AS (
           |  SELECT ca, cb,
           |         count(*) FILTER (WHERE dist <= 1) AS m1,
           |         count(*) FILTER (WHERE dist = 0) AS m0
           |  FROM fp GROUP BY ca, cb)
           |SELECT
           |  (SELECT count(DISTINCT clip_id) FROM hashes) AS n_clips,
           |  (SELECT count(*) FROM pp WHERE m1 = 4) AS n_pairs_h1_m4,
           |  CAST((SELECT coalesce(sum(ca + cb), 0) FROM pp WHERE m1 = 4)
           |    AS BIGINT) AS sum_ids_h1_m4,
           |  (SELECT count(*) FROM pp WHERE m0 = 4) AS n_pairs_h0_m4,
           |  (SELECT count(*) FROM pp WHERE m0 >= 2) AS n_pairs_h0_m2,
           |  CAST((SELECT coalesce(sum(m0), 0) FROM pp WHERE m0 >= 2)
           |    AS BIGINT) AS sum_matched_h0_m2""".stripMargin))

  /** q250's audio corpus: per selected document, FOUR mono 16-bit
    * WAV streams whose amplitude is CONSTANT within each of the 65
    * equal-duration hash windows — v0 the base (520 frames, 8 per
    * window), v1 the same contour resampled to 2× the rate (1040
    * frames) at 3× gain (every byte changes; the energy contour's
    * comparisons don't), v2 with window 0's amplitude replaced so
    * exactly bit 0 of the hash flips (window 0 feeds only bit 0 —
    * the audio twin of q246's leftmost-column image flips), v3
    * unrelated content (seed id+999) — except on every 5th id, where
    * v3 is a 32-frame stream (< 65) pinning the too-short→NULL
    * contract. aud_id = doc_id·4 + variant. */
  private def audioCorpus(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import graft.operators.WavCodec
    val docs = Tables.documents(s, d).select($"doc_id").as[Long]
      .filter(id => id % 7 == 0 && id < 20000)
    docs.flatMap { id =>
      // double-mod mixed, NONNEGATIVE amplitudes (energy order ==
      // amplitude order): contours decorrelate across seeds, so the
      // d=0 pair count is dominated by the PLANTED v0-v1 copies
      // (~2% accidental contour collisions, oracle-consistent)
      def amp(seed: Long, w: Int): Int =
        (((seed * 1103515245L + w * 12345L + (seed % 65521) * w * w)
          % 2147483647L) % 181L).toInt
      val v0 = Array.tabulate(520)(f => amp(id, f / 8))
      val v1 = Array.tabulate(1040)(f => 3 * amp(id, f / 16))
      // window 0 feeds only bit 0 (E(0) vs E(1)): replace its
      // amplitude with 0 (forces the bit off) or 128 (128² > max
      // amp² = 90², forces it on) — Hamming distance exactly 1
      val flip0 = if (amp(id, 0) > amp(id, 1)) 0 else 200 // 200 > any amp
      val v2 = Array.tabulate(520)(f => if (f / 8 == 0) flip0 else amp(id, f / 8))
      val v3 =
        if ((id / 7) % 5 == 0) Array.tabulate(32)(f => amp(id + 999, f % 16))
        else Array.tabulate(520)(f => amp(id + 999, f / 8))
      Seq((id * 4 + 0L, WavCodec.encode(8000, 1, 16, v0)),
        (id * 4 + 1L, WavCodec.encode(16000, 1, 16, v1)),
        (id * 4 + 2L, WavCodec.encode(8000, 1, 16, v2)),
        (id * 4 + 3L, WavCodec.encode(8000, 1, 16, v3)))
    }.toDF("aud_id", "payload")
  }

  /** q250 — AUDIO perceptual near-dup ([[graft.operators.Multimodal
    * .audioEnergyHash]]): real WAV decode → 65-window energy-contour
    * dHash → [[graft.operators.Dedup.hammingNearDupPairs]] (banded,
    * pigeonhole recall, never all-pairs) — the audio member of the
    * perceptual-dedup triad (image q243/q245/q246, video q249). The
    * resampled+gain-scaled copy pairs at radius 0 (every byte
    * differs; the contour doesn't), the bit-0 flip needs radius 1,
    * unrelated and too-short streams never pair. The oracle
    * recomputes every window amplitude from the construction
    * arithmetic, compares squared amplitudes (constant-amplitude
    * windows make mean-energy order amplitude² order), assembles the
    * 64-bit hash, and takes TRUE all-pairs `bit_count(xor)` as
    * ground truth — banding recall, gain/resample invariance, the
    * planted flip and the NULL contract are all pinned. */
  val q250AudioNearDup = GQuery(
    "q250_audio_neardup",
    (s, d) => {
      import s.implicits._
      import graft.operators.Dedup
      val corpus = audioCorpus(s, d)
      val hashed = Multimodal.audioEnergyHash(corpus, "payload")
      val ok = hashed.where($"ahash".isNotNull).persist()
      val nRows = corpus.count()
      val nHashed = ok.count()
      val nP0 = Dedup.hammingNearDupPairs(ok, "aud_id", "ahash",
        maxHamming = 0, bands = 4).count()
      val a1 = Dedup.hammingNearDupPairs(ok, "aud_id", "ahash",
        maxHamming = 1, bands = 4)
        .agg(count(lit(1)).cast("long"),
          coalesce(sum($"id_a" + $"id_b"), lit(0L)).cast("long")).collect()(0)
      ok.unpersist()
      Seq((nRows, nHashed, nP0, a1.getLong(0), a1.getLong(1)))
        .toDF("n_rows", "n_hashed", "n_pairs_h0", "n_pairs_h1",
          "sum_pair_ids")
    },
    Some("""WITH ids AS (
           |  SELECT doc_id AS id FROM documents
           |  WHERE doc_id % 7 = 0 AND doc_id < 20000),
           |amp AS (
           |  SELECT i.id, v.v, w.w,
           |    CASE WHEN v.v = 2 AND w.w = 0 THEN
           |      CASE WHEN (i.id*1103515245 % 2147483647) % 181 >
           |                ((i.id*1103515245 + 12345 + (i.id % 65521))
           |                 % 2147483647) % 181
           |        THEN 0 ELSE 200 END
           |    WHEN v.v = 3 THEN
           |      ((((i.id + 999)*1103515245 + w.w*12345 +
           |         ((i.id + 999) % 65521)*w.w*w.w) % 2147483647) % 181)
           |    ELSE (CASE WHEN v.v = 1 THEN 3 ELSE 1 END) *
           |         (((i.id*1103515245 + w.w*12345 +
           |            (i.id % 65521)*w.w*w.w) % 2147483647) % 181)
           |    END AS a
           |  FROM ids i, (VALUES (0),(1),(2),(3)) AS v(v), range(65) AS w(w)
           |  WHERE NOT (v.v = 3 AND (i.id // 7) % 5 = 0)),
           |hashes AS (
           |  SELECT a.id, a.v, a.id*4 + a.v AS aud_id,
           |    CAST(sum(CASE WHEN a.a*a.a > b.a*b.a THEN
           |        CASE WHEN a.w = 63 THEN (-9223372036854775808)::HUGEINT
           |             ELSE (1::BIGINT << CAST(a.w AS INT))::HUGEINT END
           |      ELSE 0::HUGEINT END) AS BIGINT) AS h
           |  FROM amp a JOIN amp b
           |    ON a.id = b.id AND a.v = b.v AND b.w = a.w + 1
           |  WHERE a.w < 64
           |  GROUP BY a.id, a.v),
           |pairs AS (
           |  SELECT a.aud_id AS ia, b.aud_id AS ib,
           |         bit_count(xor(a.h, b.h)) AS d
           |  FROM hashes a JOIN hashes b ON a.aud_id < b.aud_id
           |  WHERE bit_count(xor(a.h, b.h)) <= 1)
           |SELECT
           |  (SELECT count(*) * 4 FROM ids) AS n_rows,
           |  (SELECT count(*) FROM hashes) AS n_hashed,
           |  (SELECT count(*) FROM pairs WHERE d = 0) AS n_pairs_h0,
           |  (SELECT count(*) FROM pairs) AS n_pairs_h1,
           |  CAST((SELECT coalesce(sum(ia + ib), 0) FROM pairs) AS BIGINT)
           |    AS sum_pair_ids""".stripMargin))

  val all: Seq[GQuery] = Seq(
    q32DimCustomer, q33FactOrders, q34StarAgg, q39ValidationReport,
    q48FlagshipPipeline, q50MultimodalMeta, q51WindowTumbling,
    q52NestedJson, q53NestedExplode, q54SeedCatalog,
    q65TagBridge, q66BridgeOrderPart, q67FactMetricas, q68TagRevenue,
    q76MultimodalPlans, q176ImageHeaders, q205PngPixels, q211GifPixels,
    q212WavAudio, q213JpegPixels, q214VideoMeta, q243ImageNearDup,
    q245ImageDedupGroups, q246HammingRecall, q249ClipNearDup,
    q250AudioNearDup)
}
