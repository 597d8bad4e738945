package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers, per the usual ANN playbook:
  *  - [[bruteForceTopK]]: exact cosine top-k — O(|Q|×|N|) but fully
  *    distributed (broadcast the query set, scan the corpus once).
  *    The right tool when |Q| is small; the baseline for recall.
  *  - [[hyperplaneBuckets]]: random-hyperplane LSH (sign-bit sketch,
  *    Charikar '02) — deterministic pseudo-random hyperplanes so
  *    signatures are reproducible across engines/runs. At 100 TB the
  *    bucket id becomes the shuffle key and candidate generation is an
  *    equi-join, like MinHash banding for text.
  *
  * Vector math is pure column expressions (`zip_with` + `aggregate`,
  * sequential fold in document order) — deterministic, codegen-friendly,
  * no UDF.
  */
object Similarity {

  /** Elementwise double-cast of a float vector. */
  def asDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** LSH geometry auto-tuning: smallest plane count `b >= minBits` with
    * expected bucket occupancy `n / 2^b <= targetOccupancy`. Pinned LSH
    * geometry is the classic scale cliff — fixed buckets mean occupancy
    * grows with n and in-bucket candidate pairs grow with n², so a 10×
    * corpus costs 100×. Growing `bits` with log2(n) keeps occupancy (and
    * therefore pairs-per-bucket) constant: candidate volume scales
    * linearly with the corpus. Integer arithmetic only (no floating
    * log2) so an oracle in another engine computes the identical value
    * from the identical count. */
  def adaptiveBits(n: Long, targetOccupancy: Int, minBits: Int = 8): Int = {
    require(targetOccupancy > 0 && minBits >= 1 && minBits <= 62)
    var b = minBits
    while (b < 62 && (targetOccupancy.toLong << b) < n) b += 1
    b
  }

  /** Coarse-quantizer sizing for [[semanticDedup]]-style cell blocking:
    * shards per natural cell so total cells grow linearly with the
    * corpus (ceil(n / perCellBudget)). SemDeDup's pairing cost is
    * Σ|cell|²; the paper's remedy is k ∝ n — with cells fixed, 10× data
    * is 100× pairs. Integer ceiling division, oracle-reproducible. */
  def adaptiveShards(n: Long, perCellBudget: Long): Long = {
    require(perCellBudget > 0)
    math.max(1L, (n + perCellBudget - 1) / perCellBudget)
  }

  /** Sequential-fold dot product: deterministic accumulation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Declarative cosine — kept as the readable reference form and the
    * equivalence-spec twin of [[cosineNative]]. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Codegen'd cosine (CosineSimilarityExpr): bit-identical to
    * [[cosine]] but stays inside whole-stage codegen — higher-order
    * functions evaluate via interpreted lambdas, so the declarative
    * form breaks the codegen span exactly where the ANN scans are
    * hottest. Used by the scan-side paths below. */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.Natives.cosine(a, b)

  /** Exact cosine top-k: for each query vector (small set, broadcast),
    * scan the corpus, keep k best per query through the engine's
    * bounded-heap TopKPerKey operator (O(k) memory per query where the
    * window row_number form sorts every query's full candidate list;
    * selection proven row-identical to the window form in
    * TopKStrategySpec and by the q45/q56 window oracles). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("cid"), asDouble(col("embedding")).as("cv"))
    val sims = c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", cosineNative(col("qv"), col("cv")))
      // NULL sims (zero-norm / malformed vectors) are EXCLUDED from
      // ranking by explicit contract — TopKPerKey never ranks a
      // NULL-order row, whereas the window form would backfill them
      // once a query has < k finite candidates; the filter makes the
      // two forms (and the DuckDB oracle) agree by construction
      .filter(col("sim").isNotNull)
    graft.plans.TopK.perKey(sims, Seq("qid"), "sim", "cid", k)
      .select(col("qid"), col("cid"), round(col("sim"), 4).as("sim"))
  }

  /** Deterministic pseudo-random hyperplane component w[j][k] in
    * (-0.5, 0.5): a = ((j*dim+k)*2654435761) mod 1000003, then
    * (a² mod 1000003)/1000003 - 0.5 — the square decorrelates planes
    * (see NativeHelpers.planeWeight for why the plain Knuth hash was a
    * correlated arithmetic progression). Reproducible anywhere. */
  def hyperplaneComponent(j: Column, k: Column, dim: Int): Column = {
    val a = pmod((j * lit(dim.toLong) + k) * lit(2654435761L), lit(1000003L))
    ((a * a % lit(1000003L)).cast(DoubleType) / lit(1000003.0)) - lit(0.5)
  }

  /** Sign-bit LSH bucket id over `bits` hyperplanes — codegen'd native
    * (see HyperplaneBucketExpr; the declarative twin runs dim × bits
    * interpreted lambda evals per row). */
  def hyperplaneBuckets(v: Column, dim: Int, bits: Int): Column =
    graft.functions.Natives.hyperplaneBucket(asDouble(v), dim, bits)

  /** Declarative twin of [[hyperplaneBuckets]]. */
  def hyperplaneBucketsDeclarative(v: Column, dim: Int, bits: Int): Column = {
    val vd = asDouble(v)
    def pow2(j: Column): Column = pow(lit(2.0), j).cast(LongType)
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, j) => {
      val proj = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
        (s2, k) => s2 + element_at(vd, k + 1) * hyperplaneComponent(j, k, dim))
      acc + when(proj > 0, pow2(j)).otherwise(lit(0L))
    })
  }

  /** Centroid components per label via posexplode + (label, pos)
    * aggregation — the scalable elementwise-mean pattern (no
    * collect_list of whole vectors through the shuffle). */
  def centroidComponents(df: DataFrame, labelCol: String): DataFrame =
    df.select(col(labelCol), posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos"))
      .agg(avg(col("x")).as("avg_x"), count(lit(1)).as("n"))

  /** Reassembled centroid vectors (cell_id, centroid) — the coarse
    * quantizer for [[ivfTopK]]. Cells stay small (one per label here;
    * k-means would slot in identically), so downstream joins broadcast. */
  def buildCentroids(df: DataFrame, labelCol: String): DataFrame =
    centroidComponents(df, labelCol)
      .groupBy(col(labelCol).as("cell_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("avg_x")))),
        x => x.getField("avg_x")).as("centroid"))

  /** [[buildCentroids]] with components rounded to `dp` decimals.
    * Rounding pins the centroid BITS across engines: the component
    * means inherit float-sum order nondeterminism (partition-order
    * partial sums), so two engines computing "the same" mean can
    * differ in the last ulp — harmless for recall, fatal for an
    * exact-compare oracle whose cell ASSIGNMENT consumes the
    * centroids. After rounding, both engines argmax over identical
    * doubles and the assignment is reproducible (given the assignment
    * margins are above the rounding perturbation — for the synthetic
    * corpus the min top1−top2 margin is ~3e-5 vs 5e-7 perturbation). */
  def roundedCentroids(df: DataFrame, labelCol: String, dp: Int = 6): DataFrame =
    centroidComponents(df, labelCol)
      .groupBy(col(labelCol).as("cell_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), round(col("avg_x"), dp).as("avg_x")))),
        x => x.getField("avg_x")).as("centroid"))

  /** SemDeDup (Abbas et al., arXiv:2303.09540) — semantic near-dup
    * removal at corpus scale: assign every vector to its nearest
    * coarse-quantizer cell, compare pairs ONLY within a cell, and drop
    * every vector that has a lower-id neighbor with cosine ≥ `tau`
    * (greedy keep-lowest-id — deterministic, no transitive-closure
    * pass). The cell equi-join is what makes this a 100 TB operator:
    * candidate generation shuffles on the cell id alone (never
    * all-pairs), and pairing cost is Σ|cell|² — the knob is the cell
    * count of the quantizer, exactly as in the paper.
    *
    * `maxCellSize` is the hot-cell valve (same design as
    * `Dedup.lshCandidates`' bucket cap): a cell larger than the cap is
    * excluded from pairing — its members are all KEPT, never silently
    * dropped — and [[semanticDedupDroppedCells]] is the accounting
    * twin, so a capped run can never silently report "no duplicates".
    *
    * Input: corpus (vec_id, embedding), centroids (cell_id, centroid).
    * Output: (vec_id, cell_id, removed_by, kept) — `removed_by` is the
    * smallest-id neighbor that evicted the vector, NULL when kept.
    * The τ comparison uses the 4-dp-rounded similarity (the
    * [[nearDupPairs]] convention) so an oracle in another engine
    * cannot diverge on a 1-ulp boundary. */
  def semanticDedup(corpus: DataFrame, centroids: DataFrame, tau: Double,
      maxCellSize: Int = Int.MaxValue): DataFrame = {
    // materialized once: the cell assignment (a corpus-scan × centroid
    // broadcast — the dominant cost at scale) feeds both sides of the
    // pair join, the hot-cell aggregate, and the output join; without
    // it the scan would recompute up to four times in one action.
    // localCheckpoint (not persist): its blocks are released by the
    // ContextCleaner when the frame is GC'd, whereas a CacheManager
    // entry from persist() pins corpus-sized storage until an explicit
    // unpersist this API has no hook for.
    val assigned = corpus.join(nearestCells(corpus, centroids, 1), "vec_id")
      .select(col("vec_id"), col("cell_id"), asDouble(col("embedding")).as("__v"))
      .localCheckpoint(true)
    val eligible =
      if (maxCellSize == Int.MaxValue) assigned
      else {
        val hot = assigned.groupBy(col("cell_id")).agg(count(lit(1)).as("__csz"))
          .filter(col("__csz") > maxCellSize).select(col("cell_id"))
        assigned.join(hot, Seq("cell_id"), "left_anti")
      }
    val a = eligible.select(col("cell_id"), col("vec_id").as("id_a"), col("__v").as("__va"))
    val b = eligible.select(col("cell_id"), col("vec_id").as("id_b"), col("__v").as("__vb"))
    val removedBy = a.join(b, Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(cosineNative(col("__va"), col("__vb")), 4) >= lit(tau))
      .groupBy(col("id_b").as("vec_id"))
      .agg(min(col("id_a")).as("removed_by"))
    assigned.select(col("vec_id"), col("cell_id"))
      .join(removedBy, Seq("vec_id"), "left")
      .withColumn("kept", col("removed_by").isNull)
  }

  /** Accounting twin of [[semanticDedup]]'s `maxCellSize` valve: the
    * cells a given cap WOULD exclude from pairing, as
    * (cell_id, cell_size) rows — the ledger that keeps a capped run
    * honest (mirrors `Dedup.lshDroppedBuckets`). */
  def semanticDedupDroppedCells(corpus: DataFrame, centroids: DataFrame,
      maxCellSize: Int): DataFrame =
    corpus.join(nearestCells(corpus, centroids, 1), "vec_id")
      .groupBy(col("cell_id")).agg(count(lit(1)).as("cell_size"))
      .filter(col("cell_size") > maxCellSize)

  /** Product-quantization sub-codebooks (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the vector is split
    * into `m` contiguous subspaces of `dim/m` components; each
    * subspace gets its own small codebook and a vector encodes as `m`
    * small codes — 64 dims × 4 bytes becomes `m` bytes, the memory
    * tier between SQ8 (per-component) and IVF (whole-vector cells).
    * Codebooks here are per-label subspace means (the deterministic,
    * cross-engine-reproducible choice, like [[buildCentroids]] —
    * k-means would slot in identically), components rounded to `dp`
    * decimals for the same reason as [[roundedCentroids]].
    * Output: (sub, code, centroid[dim/m]). */
  def pqCodebooks(corpus: DataFrame, labelCol: String, m: Int, dim: Int,
      dp: Int = 6): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    corpus
      .select(col(labelCol).as("code"), posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
      .withColumn("sub", (col("pos") / subDim).cast("int"))
      .withColumn("spos", col("pos") % subDim)
      .groupBy(col("sub"), col("code"), col("spos"))
      .agg(round(avg(col("x")), dp).as("c"))
      .groupBy(col("sub"), col("code"))
      .agg(transform(
        array_sort(collect_list(struct(col("spos"), col("c")))),
        x => x.getField("c")).as("centroid"))
  }

  /** TRAINED PQ sub-codebooks: per-subspace Lloyd's k-means under the
    * L2 metric [[pqEncode]] assigns with — the quality path when no
    * label column exists or labels don't cluster the subspaces (the
    * label-mean [[pqCodebooks]] stays as the deterministic,
    * oracle-friendly variant). All m subspaces train in ONE
    * distributed frame (vec_id × sub rows, materialized once); the
    * per-iteration state — m × codesPerSub × (dim/m) doubles,
    * quantizer metadata — collects to the driver between iterations so
    * lineage stays flat at any corpus size (the [[kmeansCentroids]]
    * pattern; at 100 TB you train on a bounded sample, exactly as
    * FAISS does, then encode the full corpus with the frozen books).
    * Init is deterministic: the codesPerSub lowest-vec_id DISTINCT
    * subvectors per subspace (repeating the last when a subspace has
    * fewer distinct values — the code space stays dense
    * 0..codesPerSub-1, [[pqTopK]]'s guard requirement, by
    * construction; an emptied code keeps its previous centroid).
    * Components round to `dp` decimals at the END so encode decisions
    * are reproducible (see [[roundedCentroids]]); the component means
    * still inherit float-sum order nondeterminism across partitions,
    * so downstream quality is recall-asserted (AnnRecallSpec), never
    * hash-oracled — the q154 convention. Output: (sub, code,
    * centroid[dim/m]), drop-in for [[pqEncode]]/[[pqTopK]]. */
  def pqCodebooksTrained(corpus: DataFrame, m: Int, dim: Int, codesPerSub: Int,
      iters: Int, dp: Int = 6): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val subs = corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("__v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("vec_id"), col("sub"),
        slice(col("__v"), col("sub") * subDim + 1, lit(subDim)).as("sv"))
      .localCheckpoint(true)
    def toDf(cb: Map[(Int, Int), Seq[Double]]): DataFrame =
      cb.toSeq.map { case ((s2, c), v) => (s2, c, v) }.toDF("sub", "code", "centroid")
    // deterministic init from a BOUNDED pool: the lowest-vec_id rows
    // via TakeOrderedAndProject (never a per-sub sort of all distinct
    // subvectors — that's a corpus-sized shuffle at 100 TB for init
    // metadata), de-duplicated per subspace in vec_id order on the
    // driver; a pool with fewer distinct values pads with the last
    val pool = subs.orderBy(col("vec_id"), col("sub")).limit(codesPerSub * 8 * m)
      .collect().map(r => (r.getInt(1), r.getLong(0), r.getSeq[Double](2).toSeq))
    var books: Map[(Int, Int), Seq[Double]] =
      (0 until m).flatMap { s2 =>
        val svs = pool.filter(_._1 == s2).sortBy(_._2).map(_._3).distinct
        require(svs.nonEmpty, s"pqCodebooksTrained: subspace $s2 has no vectors")
        (0 until codesPerSub).map(c =>
          (s2, c) -> svs(math.min(c, svs.length - 1))) // pad: dense code space always
      }.toMap
    for (_ <- 1 to iters) {
      val assigned = subs.join(broadcast(toDf(books)), "sub")
        // codegen'd l2sq_native ≡ the aggregate(zip_with(...)) fold
        // bit-for-bit (NativeL2Spec) — the HOF ran an interpreted
        // lambda per (vector, sub, code) row
        .withColumn("__dd", graft.functions.Natives.l2sq(col("sv"), col("centroid")))
        .groupBy(col("vec_id"), col("sub"))
        .agg(min(struct(col("__dd"), col("code"))).as("__m"))
        .select(col("vec_id"), col("sub"), col("__m.code").as("code"))
      val comps = subs.join(assigned, Seq("vec_id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("spos", "x")))
        .groupBy(col("sub"), col("code"), col("spos"))
        .agg(avg(col("x")).as("c"))
        .collect()
      val updated = comps.groupBy(r => (r.getInt(0), r.getInt(1))).map { case (k2, rows) =>
        k2 -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      }
      books = books.map { case (k2, old) => k2 -> updated.getOrElse(k2, old) }
    }
    toDf(books.map { case (k2, v) =>
      k2 -> v.map(x => BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble)
    })
  }

  /** PQ encoding: per (vector, subspace), the code of the nearest
    * sub-centroid by L2 (ties to the smaller code via min-of-struct —
    * map-side combinable, the corpus never sort-shuffles). Output:
    * (vec_id, codes array[m] ordered by subspace) — the compressed
    * representation that persists / shuffles in place of the vector. */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int, dim: Int): DataFrame = {
    val subDim = dim / m
    corpus
      .select(col("vec_id"), asDouble(col("embedding")).as("__v"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .withColumn("__sv", slice(col("__v"), col("sub") * subDim + 1, lit(subDim)))
      .join(broadcast(codebooks), "sub")
      // codegen'd l2sq_native ≡ the aggregate(zip_with(...)) fold
      // bit-for-bit (NativeL2Spec); the HOF form ran an interpreted
      // lambda per (vector, subspace, code) row — m × codesPerSub per
      // corpus vector, the encode scan's inner loop
      .withColumn("__d", graft.functions.Natives.l2sq(col("__sv"), col("centroid")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("__d"), col("code"))).as("__m"))
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("__m.code").as("code")))),
        x => x.getField("code")).as("codes"))
  }

  /** PQ top-k by Asymmetric Distance Computation: each query
    * precomputes an m×`codesPerSub` lookup table of subspace L2
    * distances to every sub-centroid (tiny — broadcast), and a
    * document's approximate distance is m ORDERED table lookups summed
    * sequentially over its codes — never a touch of the original
    * vector. The fold order is pinned (subspace 0..m−1) so another
    * engine summing the same LUT entries cannot diverge in the last
    * ulp and flip a ranking tie. Scale shape: the corpus side scans
    * (vec_id, codes[m]) only; all per-query state rides the broadcast.
    * Output: (qid, cid, adist) ranked k-best per query (ascending
    * distance, id tie-break). */
  def pqTopK(queries: DataFrame, codes: DataFrame, codebooks: DataFrame,
      k: Int, m: Int, dim: Int, codesPerSub: Int): DataFrame = {
    val subDim = dim / m
    // ADC indexes the sorted LUT positionally (s*codesPerSub + c): any
    // gap, offset, DUPLICATE, or missing subspace shifts every later
    // position and silently corrupts the ranking — the codebook is
    // tiny, so refuse loudly up front instead. count(*) must equal the
    // distinct count (no duplicate (sub, code) rows), and the subspace
    // set must be exactly 0..m-1 (a missing sub yields no group row,
    // which a per-group check alone would never see).
    val shape = codebooks.agg(
      countDistinct(col("sub")).as("__nsubs"),
      min(col("sub")).cast("long").as("__smn"),
      max(col("sub")).cast("long").as("__smx")).collect()(0)
    require(shape.getLong(0) == m && shape.getLong(1) == 0L && shape.getLong(2) == m - 1L,
      s"pqTopK: codebooks must cover exactly subspaces 0..${m - 1}")
    val badSubs = codebooks.groupBy(col("sub"))
      .agg(count(lit(1)).as("__c"), countDistinct(col("code")).as("__n"),
        min(col("code")).as("__mn"), max(col("code")).as("__mx"))
      .filter(col("__c") =!= codesPerSub || col("__n") =!= codesPerSub ||
        col("__mn") =!= 0 || col("__mx") =!= codesPerSub - 1)
      .count()
    require(badSubs == 0,
      s"pqTopK: every subspace's codes must be the dense set 0..${codesPerSub - 1} " +
        "with no duplicates (ADC looks distances up by position)")
    val lut = queries
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("__qv"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .withColumn("__qs", slice(col("__qv"), col("sub") * subDim + 1, lit(subDim)))
      .join(broadcast(codebooks), "sub")
      .withColumn("__ld", graft.functions.Natives.l2sq(col("__qs"), col("centroid")))
      .groupBy(col("qid"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("__ld").as("ld")))),
        x => x.getField("ld")).as("__lut"))
    // scoring is the codegen'd AdcDistanceExpr (the declarative HOF
    // fold — [[adcDistanceDeclarative]] — runs interpreted lambdas per
    // corpus row; equivalence is spec-pinned bit-identical), and
    // ranking is the bounded-heap TopKPerKey in ascending mode — the
    // former window row_number form sorted every query's FULL corpus
    // candidate list with parallelism = |queries|, the exact shape the
    // operator was built to kill. adist is never NULL here (dense code
    // space enforced above + non-null LUT), so perKeyMin's
    // NULLs-dropped contract cannot diverge from the window form.
    val scored = codes.crossJoin(broadcast(lut))
      .withColumn("adist",
        graft.functions.Natives.adcDistance(col("codes"), col("__lut"), codesPerSub))
    graft.plans.TopK.perKeyMin(scored, Seq("qid"), "adist", "vec_id", k)
      .select(col("qid"), col("vec_id").as("cid"), round(col("adist"), 6).as("adist"))
  }

  /** Declarative ADC fold — the readable reference form and the
    * equivalence-spec twin of the codegen'd `adc_distance_native` used
    * by [[pqTopK]] (same subspace-ordered sequential accumulation). */
  def adcDistanceDeclarative(codes: Column, lut: Column, m: Int, codesPerSub: Int): Column =
    aggregate(
      zip_with(codes, sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(lut, (s * codesPerSub + c + 1).cast("int"))),
      lit(0.0), (acc, x) => acc + x)

  /** Nearest `nprobe` cells per vector (broadcast the tiny centroid
    * table; rank by cosine). The nprobe=1 case — the CORPUS-side
    * indexing pass, the big one at 100 TB — uses max-of-struct
    * aggregation instead of a ranked window: partial aggregation
    * combines map-side, so the corpus never sort-shuffles its
    * |corpus|×|cells| similarity rows (ties break to the larger
    * cell_id there vs the window's smaller — either is a valid
    * deterministic assignment; recall/oracle are unaffected). */
  private def nearestCells(vecs: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val sims = vecs.crossJoin(broadcast(centroids))
      .withColumn("__csim", cosineNative(asDouble(col("embedding")), col("centroid")))
    if (nprobe == 1)
      sims.groupBy(col("vec_id"))
        .agg(max(struct(col("__csim"), col("cell_id"))).as("__m"))
        .select(col("vec_id"), col("__m.cell_id").as("cell_id"))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id")).orderBy(col("__csim").desc, col("cell_id").asc)
      sims.withColumn("__crn", row_number().over(w)).filter(col("__crn") <= nprobe)
        .select(col("vec_id"), col("cell_id"))
    }
  }

  /** Distributed Lloyd's k-means for the IVF coarse quantizer.
    * Per iteration: assignment = nearest-centroid by cosine (tiny
    * centroid table broadcast; max-of-struct aggregation, map-side
    * combinable — the corpus never sort-shuffles), update = posexplode
    * component mean (one (cell,pos) shuffle of scalars, never whole
    * vectors through collect_list). Centroids — k×dim doubles, quantizer
    * metadata — collect to the driver between iterations so the lineage
    * stays flat at any corpus size (MLlib's KMeans does the same).
    * Init is deterministic (the k lowest-vec_id vectors); the component
    * means inherit float-sum order nondeterminism across partitions, so
    * downstream uses must not depend on exact centroid bits — IVF at
    * nprobe=cells is exact regardless (q80), and the recall dial only
    * shifts marginally. An emptied cell keeps its previous centroid. */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def toDf(cs: Seq[(Int, Seq[Double])]): DataFrame =
      cs.toDF("cell_id", "centroid")
    var cents: Seq[(Int, Seq[Double])] =
      corpus.select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .orderBy(col("vec_id")).limit(k).collect()
        .toSeq.zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }
    for (_ <- 1 to iters) {
      val assign = nearestCells(corpus, toDf(cents), 1)
      val comps = corpus.join(assign, "vec_id")
        .select(col("cell_id"), posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
        .groupBy(col("cell_id"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
      val updated = comps.groupBy(_.getInt(0)).map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      cents = cents.map { case (cid, old) => (cid, updated.getOrElse(cid, old)) }
    }
    toDf(cents)
  }

  /** Mean best-centroid cosine over the corpus — the (cosine-flavored)
    * inertia twin, for asserting Lloyd's iterations don't regress. */
  def quantizerScore(corpus: DataFrame, centroids: DataFrame): Double =
    corpus.crossJoin(broadcast(centroids))
      .withColumn("__csim", cosineNative(asDouble(col("embedding")), col("centroid")))
      .groupBy(col("vec_id")).agg(max(col("__csim")).as("best"))
      .agg(avg(col("best"))).collect()(0).getDouble(0)

  /** Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket as
    * the blocking key (sign sketch → equi-join, never all-pairs), then
    * exact cosine ≥ threshold on candidates only. The embedding twin of
    * `Dedup.lshCandidates`→`jaccard`: at 100 TB the bucket id is the
    * only shuffled pair key and AQE can skew-split hot buckets. The
    * threshold compares the 4-dp-rounded similarity so an oracle in
    * another engine can't diverge on a 1-ulp boundary.
    *
    * Input: (vec_id, v: array<double>). Output: (id_a, id_b, sim)
    * with id_a < id_b. Single-table LSH: a near-dup pair whose sketch
    * differs in ≥1 of `bits` signs is missed — raise recall with fewer
    * bits (coarser buckets) or OR-multiple tables, the standard dial.
    *
    * `maxBucketSize` is the hot-bucket guard (see
    * `Dedup.lshCandidates` for the full contract): buckets larger than
    * the cap are dropped before the self-join, bounding candidate
    * output linearly in corpus size where an embedding-duplicate flood
    * (re-crawled pages, default-value vectors) would otherwise emit
    * quadratically. Run exact dedup on the vector fingerprint first;
    * the cap is the backstop. Default = unguarded. */
  def nearDupPairs(corpus: DataFrame, dim: Int, bits: Int, threshold: Double,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val b0 = corpus.select(col("vec_id"), col("v"),
      graft.functions.Natives.hyperplaneBucket(col("v"), dim, bits).as("__bucket"))
    val b = Dedup.capBuckets(b0, "__bucket", maxBucketSize)
    b.alias("a").join(b.alias("b"),
        col("a.__bucket") === col("b.__bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(cosineNative(col("a.v"), col("b.v")), 4))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("sim"))
  }

  /** Near-dup dedup keep-set: drop every vector that appears as the
    * larger id of a qualifying pair (greedy keep-smallest — one hop, no
    * iterative connected components; the standard first-pass policy). */
  def nearDupDrops(pairs: DataFrame): DataFrame =
    pairs.select(col("id_b").as("vec_id")).distinct()

  /** INCREMENTAL embedding-cosine ingestion against a persisted
    * BUCKET ledger — the embedding member of the incremental-dedup
    * family ([[graft.operators.Dedup.ingestDeduped]] exact,
    * [[graft.operators.Dedup.ingestPerceptual]] perceptual-hash,
    * this one cosine): re-pairing the whole corpus per arriving batch
    * is O(corpus); this is O(batch + the ledger files the batch's
    * buckets touch). Input is (vec_id, v: array<double>). A batch
    *
    *  1. self-dedups with the ONE-HOP GREEDY policy over
    *     [[nearDupPairs]]'s single-table candidates (bucket equi-join,
    *     exact cosine ≥ `threshold` verify, hot-bucket valve): a row
    *     survives iff it has no smaller-id qualifying neighbor —
    *     deterministic, replayable as one NOT EXISTS;
    *  2. probes the ledger table, which holds one
    *     (bucket_key, vec_id, v) row per ACCEPTED vector — the ledger
    *     carries its own verify payload (≈1× extra embedding storage,
    *     the standard space-for-IO trade: the probe stays one
    *     file-pruned scan instead of a second fetch join against the
    *     corpus). Appends land range-sorted by bucket_key (pinned
    *     partition count, layout-pinned commit door), so
    *     [[graft.io.DeltaRead.readVersionWherePoints]] reads only the
    *     files the batch's bucket values can land in. A survivor
    *     within `threshold` cosine of any ledger vector in its bucket
    *     drops; `maxBucketSize` also valves the probe side (hot
    *     ledger buckets are skipped — see the in-code note). Recall is LSH-probabilistic, NOT the Hamming tier's
    *     pigeonhole: a near-dup whose sketch differs in ≥1 of `bits`
    *     signs is missed — same single-table dial as [[nearDupPairs]]
    *     (fewer bits = coarser buckets = higher recall/cost);
    *  3. appends survivors to `corpusTable` and their ledger rows to
    *     `ledgerTable`.
    *
    * Exactly-once and crash recovery mirror `ingestDeduped`: `batchId`
    * dedups replays per table via Delta SetTransactions, corpus
    * committed FIRST (a crash between the appends replays to
    * convergence: the fresh set recomputes deterministically against
    * the still-unadvanced ledger). Same single-stream assumption —
    * serialize batches per corpus. Returns (survivors, dropped). */
  def ingestEmbeddings(batch: DataFrame, corpusTable: String,
      ledgerTable: String, dim: Int, bits: Int, threshold: Double,
      maxBucketSize: Int = Int.MaxValue,
      batchId: Option[(String, Long)] = None): (Long, Long) = {
    val spark = batch.sparkSession
    val pairs = nearDupPairs(batch, dim, bits, threshold, maxBucketSize)
    val selfSurv = batch.join(nearDupDrops(pairs), Seq("vec_id"), "left_anti")
    val ledgerHead =
      try Some(graft.io.DeltaRead.latestVersion(ledgerTable)).filter(_ >= 0)
      catch { case _: Exception => None }
    val fresh0 = ledgerHead match {
      case None => selfSurv
      case Some(head) =>
        val bucketed = selfSurv.select(col("vec_id"), col("v"),
          graft.functions.Natives.hyperplaneBucket(col("v"), dim, bits)
            .as("__bucket"))
        // PRUNED PROBE (the ingestDeduped shape, keyed on bucket_key)
        val bksSorted: Option[Array[Long]] = {
          val capped = bucketed.select(col("__bucket")).distinct()
            .limit(100001).collect()
          if (capped.length > 100000) None
          else Some(capped.map(_.getLong(0)).sorted)
        }
        val ledger = bksSorted match {
          case Some(points) => graft.io.DeltaRead.readVersionWherePoints(
            spark, ledgerTable, head, "bucket_key", points)
          case None => graft.io.DeltaRead.read(spark, ledgerTable)
        }
        // probe-side valve (see Dedup.ingestPerceptual): accepted
        // vectors can pile into one sketch bucket, and a hot ledger
        // bucket makes every future batch compare against it; capped
        // buckets skip the probe there (dups admitted — the documented
        // valve trade). Accounting: read(ledgerTable)
        //   .groupBy("bucket_key").count().filter(> cap).
        val ledgerCapped = Dedup.capBuckets(
          ledger.select(col("bucket_key").as("__bucket"),
            col("v").as("__lv")), "__bucket", maxBucketSize)
        val hit = bucketed
          .join(ledgerCapped, "__bucket")
          .where(round(cosineNative(col("v"), col("__lv")), 4) >= threshold)
          .select(col("vec_id")).distinct()
        selfSurv.join(hit, Seq("vec_id"), "left_anti")
    }
    val fresh = fresh0.persist()
    try {
      val total = batch.count()
      val nNew = fresh.count()
      if (nNew > 0) {
        val rowsPerFile = spark.conf.getOption("spark.graft.dedup.ledgerRowsPerFile")
          .flatMap(_.toLongOption).filter(_ >= 1).getOrElse(500000L)
        val nParts = math.max(1L, (nNew + rowsPerFile - 1) / rowsPerFile)
          .min(10000L).toInt
        val ledgerRows = fresh.select(
          graft.functions.Natives.hyperplaneBucket(col("v"), dim, bits)
            .as("bucket_key"),
          col("vec_id"), col("v"))
          .repartitionByRange(nParts, col("bucket_key"))
          .sortWithinPartitions(col("bucket_key"))
        batchId match {
          case Some((app, ver)) =>
            graft.io.DeltaWrite.appendOnce(fresh, corpusTable, app, ver)
            graft.io.DeltaWrite.appendOnceLayoutPinned(
              ledgerRows, ledgerTable, s"$app.ledger", ver)
          case None =>
            graft.io.DeltaWrite.append(fresh, corpusTable)
            graft.io.DeltaWrite.appendLayoutPinned(ledgerRows, ledgerTable)
        }
      }
      (nNew, total - nNew)
    } finally fresh.unpersist(blocking = false)
  }

  /** Multi-table OR-LSH near-dup: `tables` independent `bits`-plane
    * sketches, candidates OR-ed across tables — the standard recall
    * amplifier (a pair is missed only if EVERY table splits it;
    * P[miss] ≈ (1-p^bits)^tables). One native bucket evaluation
    * computes all tables*bits sign bits packed in a long; per-table
    * sub-buckets are shift/mask column math, so the extra recall costs
    * one explode, not extra projections over the vector. Table 0's
    * planes are exactly [[nearDupPairs]]'s, so the single-table
    * candidate set is a subset by construction (spec-pinned). */
  def nearDupPairsMulti(corpus: DataFrame, dim: Int, bits: Int,
      threshold: Double, tables: Int,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val total = bits * tables
    require(total <= 62, s"tables*bits must fit a long, got $total")
    val mask = (1L << bits) - 1
    val banded0 = corpus.select(col("vec_id"),
        graft.functions.Natives.hyperplaneBucket(col("v"), dim, total).as("__all"),
        explode(sequence(lit(0), lit(tables - 1))).as("__t"))
      .select(col("vec_id"), concat_ws(":", col("__t"),
        expr(s"shiftright(__all, __t * $bits)").bitwiseAND(lit(mask))).as("__bk"))
    // hot-bucket guard, per table-bucket — see nearDupPairs/Dedup.lshCandidates
    val banded = Dedup.capBuckets(banded0, "__bk", maxBucketSize)
    // SHUFFLE_HASH on the band self-join: the band table is two narrow
    // columns (vec_id + band key) whose post-window size estimate blows
    // past the broadcast threshold at scale, so the planner falls back
    // to sort-merge — two full sorts of the band table for an equi-join
    // whose per-partition build side is tiny. A hash build on one side
    // skips both sorts; strategy-only, candidate set unchanged.
    val cand = banded.alias("a").join(banded.hint("shuffle_hash").alias("b"),
        col("a.__bk") === col("b.__bk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val vecs = corpus.select(col("vec_id"), col("v"))
    cand
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("__va")), "id_a")
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("__vb")), "id_b")
      .withColumn("sim", round(cosineNative(col("__va"), col("__vb")), 4))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** IVF-style ANN (inverted-file over a coarse quantizer): corpus
    * vectors index into their nearest cell; a query probes only its
    * `nprobe` nearest cells. At 100 TB the cell id is the shuffle/
    * partition key and each probe touches 1/cells of the corpus —
    * the standard recall-vs-cost dial (nprobe = all cells ≡ exact
    * brute force). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val indexed = corpus
      .join(nearestCells(corpus, centroids, 1), "vec_id")
      .select(col("vec_id").as("cid"), col("cell_id"), asDouble(col("embedding")).as("cv"))
    val probes = queries
      .join(nearestCells(queries, centroids, nprobe), "vec_id")
      .select(col("vec_id").as("qid"), col("cell_id"), asDouble(col("embedding")).as("qv"))
    // broadcast the probe side when its size allows: |queries|×nprobe
    // rows vs the corpus — without the hint the static plan
    // sort-merge-joins (shuffling the ENTIRE indexed corpus), but a
    // HARD hint would force-OOM a corpus-sized query set (kNN-graph
    // builds). The post-join stats estimate is useless here (join
    // multiplication inflates it past any threshold even for 5 probe
    // vectors), so the gate sizes the RAW query frame — whose estimate
    // comes from file stats — times the probed-cell fan-out, capped by
    // the actual cell count (one tiny count over the centroid frame).
    val cells = centroids.select(col("cell_id")).distinct().count()
    val probeBytes = Joins.estimatedBytes(queries) *
      math.min(nprobe.toLong, math.max(cells, 1L))
    val probesSide =
      if (probeBytes <= Joins.DefaultBroadcastBytes) broadcast(probes) else probes
    val sims = indexed.join(probesSide, "cell_id")
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosineNative(col("qv"), col("cv")))
      .filter(col("sim").isNotNull) // see bruteForceTopK NULL contract
    // bounded-heap top-k per query (see bruteForceTopK note)
    graft.plans.TopK.perKey(sims, Seq("qid"), "sim", "cid", k)
      .select(col("qid"), col("cid"), round(col("sim"), 4).as("sim"))
  }

  /** Per-dimension (lo, hi) bounds of the corpus as two ordered array
    * columns in a single-row frame — the training pass of a uniform
    * scalar quantizer (FAISS "SQ8"). posexplode → per-position min/max
    * → re-assembled via sorted-struct collect (a groupBy shuffle of
    * dim×2 doubles; never a vector collect to the driver).
    */
  def sq8Bounds(corpus: DataFrame): DataFrame =
    corpus
      .select(posexplode(asDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("lo")))),
          e => e.getField("lo")).as("los"),
        transform(array_sort(collect_list(struct(col("pos"), col("hi")))),
          e => e.getField("hi")).as("his"))

  /** Dequantized SQ8 vector: each component is snapped to the center of
    * its 256-level uniform cell over [lo, hi]. `floor`/`least` are
    * exact integer ops, so quantization decisions are bit-reproducible
    * across engines; components at x == hi clamp into code 255. The
    * 1-byte codes are never materialized here (dequant(quant(x)) fuses
    * into one expression) — at 100 TB the codes column is what a real
    * index would persist, 4× smaller than the float32 vectors.
    */
  def sq8Dequantize(v: Column, los: Column, his: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i => {
      val lo = element_at(los, i + 1)
      val w = (element_at(his, i + 1) - lo) / 256.0
      val code = least(floor((element_at(v, i + 1) - lo) / w), lit(255.0))
      lo + (code + 0.5) * w
    })

  /** Exact-over-compressed top-k: brute-force cosine of full-precision
    * queries against the SQ8-dequantized corpus (asymmetric distance —
    * the standard quality/compression trade). Same shape as
    * [[bruteForceTopK]]: queries broadcast, corpus scanned once.
    * This is the dequant-in-query REFERENCE form; the production path
    * ranks from PERSISTED 1-byte codes ([[sq8WriteIndex]] →
    * [[sq8TopKFromCodes]]) and is bit-identical (spec-pinned).
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int): DataFrame = {
    val dequantized = corpus.crossJoin(broadcast(sq8Bounds(corpus)))
      .select(col("vec_id"),
        sq8Dequantize(asDouble(col("embedding")), col("los"), col("his"), dim)
          .as("embedding"))
    // scoring/ranking/tie-break is exactly the exact-search path —
    // asymmetric distance is just brute force over the compressed side
    bruteForceTopK(queries, dequantized, k)
  }

  /** Persist the IVF index as a CELL-PARTITIONED parquet layout:
    * every corpus vector lands under `cell_id=<its nearest cell>/`.
    * This turns the IVF promise — "a probe touches 1/cells of the
    * corpus" — into DIRECTORY-level partition pruning: the probe
    * read's `cell_id IN (...)` predicate eliminates unprobed cells
    * before any file listing or I/O (spec-asserted in the scan's
    * PartitionFilters), exactly how a 100 TB deployment lays an IVF
    * index out on object storage. */
  def ivfWriteIndex(corpus: DataFrame, centroids: DataFrame, path: String): Unit =
    corpus.join(nearestCells(corpus, centroids, 1), "vec_id")
      .select(col("vec_id").as("cid"), asDouble(col("embedding")).as("cv"),
        col("cell_id").cast("int").as("cell_id"))
      .write.partitionBy("cell_id").mode("overwrite").parquet(path)

  /** Rank against the persisted cell-partitioned index. The probed
    * cell ids collect to the driver (bounded by the cell count —
    * quantizer metadata, the same class as the driver-held centroids)
    * and push down as the partition filter; everything after the
    * pruned scan is [[ivfTopK]]'s plan, and the output is row-identical
    * to it (same assignment, same vectors, same ranking). */
  def ivfTopKFromIndex(path: String, queries: DataFrame, centroids: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val probes = queries
      .join(nearestCells(queries, centroids, nprobe), "vec_id")
      .select(col("vec_id").as("qid"), col("cell_id").cast("int").as("cell_id"),
        asDouble(col("embedding")).as("qv"))
    val probedCells = probes.select(col("cell_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val indexed = spark.read.parquet(path)
      .where(col("cell_id").isin(probedCells: _*))
    val cells = centroids.select(col("cell_id")).distinct().count()
    val probeBytes = Joins.estimatedBytes(queries) *
      math.min(nprobe.toLong, math.max(cells, 1L))
    val probesSide =
      if (probeBytes <= Joins.DefaultBroadcastBytes) broadcast(probes) else probes
    val sims = indexed.join(probesSide, "cell_id")
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosineNative(col("qv"), col("cv")))
      .filter(col("sim").isNotNull)
    graft.plans.TopK.perKey(sims, Seq("qid"), "sim", "cid", k)
      .select(col("qid"), col("cid"), round(col("sim"), 4).as("sim"))
  }

  /** SQ8 codes table (vec_id, codes: binary, 1 byte per component) for
    * a corpus, against its own [[sq8Bounds]]. This is what a real
    * index PERSISTS: the codes column is 4× smaller than the float32
    * embeddings (8× than double), so the ANN scan — the memory-bound
    * loop at 100 TB — reads a quarter of the bytes. Encoding is
    * scan-side codegen'd native column math (Sq8EncodeExpr). */
  def sq8EncodeCorpus(corpus: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(sq8Bounds(corpus)))
      .select(col("vec_id"),
        graft.functions.Natives.sq8Encode(
          asDouble(col("embedding")), col("los"), col("his")).as("codes"))

  /** Persist the SQ8 index: `<path>/codes` (vec_id, codes binary) and
    * `<path>/bounds` (single row: los, his). One corpus scan. */
  def sq8WriteIndex(corpus: DataFrame, path: String): Unit = {
    val bounds = sq8Bounds(corpus)
    bounds.write.mode("overwrite").parquet(s"$path/bounds")
    sq8EncodeCorpus(corpus).write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Rank from persisted codes: asymmetric cosine of full-precision
    * queries against the coded corpus, dequantizing inside ONE fused
    * codegen'd expression (Sq8CosineExpr — no decoded-array
    * materialization, no float column read). Output is bit-identical
    * to [[sq8TopK]] on the same corpus: same dequantized values, same
    * accumulation order, same bounded-heap ranking. `queries` must not
    * appear coded — the standard query-fresh / corpus-compressed
    * asymmetric setup. */
  def sq8TopKFromCodes(queries: DataFrame, codes: DataFrame, bounds: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val sims = codes.crossJoin(broadcast(bounds))
      .join(broadcast(q), col("qid") =!= col("vec_id"))
      .withColumn("sim", graft.functions.Natives.sq8Cosine(
        col("qv"), col("codes"), col("los"), col("his")))
      .filter(col("sim").isNotNull) // see bruteForceTopK NULL contract
      .select(col("qid"), col("vec_id").as("cid"), col("sim"))
    graft.plans.TopK.perKey(sims, Seq("qid"), "sim", "cid", k)
      .select(col("qid"), col("cid"), round(col("sim"), 4).as("sim"))
  }
}
