package graft.operators

import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

import graft.functions.VectorFunctions.cosineSim

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`) — extension X2 of SURVEY.md §2.2.
  *
  * Scale design (the part that must survive 100 TB):
  *  - the *query* set is the small side: it is broadcast, so scoring is a
  *    map-side cross product over corpus partitions — no corpus shuffle;
  *  - per-query top-k uses a map-side partial top-k aggregator
  *    ([[Similarity.TopK]]): each task emits at most `k` candidates per
  *    query, so the single shuffle moves `O(queries × k × partitions)`
  *    rows, never the `O(queries × corpus)` scored pairs a window-function
  *    formulation would move;
  *  - scoring is the codegen'd [[graft.functions.CosineSimilarity]] kernel;
  *  - the LSH variant buckets both sides with deterministic
  *    random-hyperplane signatures so candidate generation becomes an
  *    equi-join on (band, bucket) — the 100 TB path where even one full
  *    scan per query batch is too much.
  */
object Similarity {

  final case class Scored(id: Long, score: Double)

  final case class TopBuf(items: List[Scored])

  /** Map-side partial top-k: keeps the k best (score desc, id asc) seen so
    * far; merge unions two partials. Deterministic under any partitioning. */
  final class TopK(k: Int) extends Aggregator[Scored, TopBuf, TopBuf] {
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    private def insert(buf: List[Scored], s: Scored): List[Scored] = {
      val (pre, post) = buf.span(better(_, s))
      val merged = pre ::: (s :: post)
      if (merged.length > k) merged.take(k) else merged
    }
    override def zero: TopBuf = TopBuf(Nil)
    override def reduce(b: TopBuf, a: Scored): TopBuf =
      if (b.items.length >= k && !better(a, b.items.last)) b
      else TopBuf(insert(b.items, a))
    override def merge(b1: TopBuf, b2: TopBuf): TopBuf =
      TopBuf(b2.items.foldLeft(b1.items)(insert))
    override def finish(r: TopBuf): TopBuf = r
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product
    override def outputEncoder: Encoder[TopBuf] = Encoders.product
  }

  /** Exact brute-force top-k cosine neighbors.
    *
    * @param queries  small frame `(idCol, vecCol)` — broadcast
    * @param corpus   large frame `(idCol, vecCol)` — scanned once, map-side
    * @param pred     optional candidate predicate (metadata filter, e.g.
    *                 `lang = 'en'`) applied INSIDE the corpus scan —
    *                 pre-filtering, so the result is exactly k MATCHING
    *                 neighbors per query (post-filtering a top-k
    *                 under-returns k, the classic wrong answer)
    * @return (query_id, neighbor_id, rank, score) with rank 1..k by
    *         (score desc, neighbor_id asc)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     excludeSelf: Boolean = true,
                     pred: Option[Column] = None): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = pred.fold(corpus)(corpus.filter)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val pairs0 = c.crossJoin(broadcast(q))
    val pairs = if (excludeSelf) pairs0.filter(col("neighbor_id") =!= col("query_id")) else pairs0
    val scored = pairs.select(
      col("query_id"), col("neighbor_id"),
      cosineSim(col("q_vec"), col("c_vec")).as("score"))
    topKPerQuery(scored, k)
  }

  /** Reduce scored (query_id, neighbor_id, score) pairs to ranked top-k per
    * query via the map-side partial aggregator. Package-visible so
    * [[IvfIndex.search]] produces bit-identical rankings to [[ivfTopK]]. */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopK(k))
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("neighbor_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top.items")).as(Seq("pos", "s")))
      .select(
        col("query_id"),
        col("s.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("s.score").as("score"))
  }

  /** Reference formulation via a window function — shuffles every scored
    * pair; kept for plan comparison and small-data cross-checks. */
  def bruteForceTopKWindow(queries: DataFrame, corpus: DataFrame, k: Int,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
              cosineSim(col("q_vec"), col("c_vec")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("score"))
  }

  // ------------------------------------------------------------------ LSH

  /** Deterministic random hyperplanes: `bands × bitsPerBand` planes of
    * dimension `dim`. Each weight is a pure function of (seed, plane,
    * dim): Box-Muller over two splitmix64 lanes of the flat index →
    * standard Gaussian. iid N(0,1) components make each plane's direction
    * uniform on the sphere, so the sign-LSH collision probability is
    * exactly 1-θ/π (cube-sampled uniforms bias toward diagonals and make
    * that formula only approximate). StrictMath keeps the doubles
    * bit-identical across JVMs/platforms. No RNG object and no iteration
    * order — identical across runs, executors, and engines, which is what
    * lets the DuckDB oracle bake the exact plane matrix into SQL
    * ([[graft.queries.VectorQueries]]). */
  def hyperplanes(dim: Int, bands: Int, bitsPerBand: Int,
                  seed: Long = 42L): Array[Array[Float]] = {
    import graft.functions.SketchKernels.mix64
    val base = mix64(seed)
    Array.tabulate(bands * bitsPerBand)(p =>
      Array.tabulate(dim) { d =>
        val i = p.toLong * dim + d
        // u1 ∈ (0,1] (never 0, so log is finite); u2 ∈ [0,1)
        val u1 = ((mix64(base + 2 * i) >>> 11) + 1.0) / (1L << 53).toDouble
        val u2 = (mix64(base + 2 * i + 1) >>> 11) / (1L << 53).toDouble
        (StrictMath.sqrt(-2.0 * StrictMath.log(u1)) *
          StrictMath.cos(2.0 * StrictMath.PI * u2)).toFloat
      })
  }

  /** Add `(band, bucket)` columns: one row per band via posexplode, bucket
    * = sign-bit signature of the band's hyperplane dots, computed by the
    * fused [[graft.functions.LshBuckets]] kernel (one pass over the plane
    * matrix per row, planes shipped as a codegen reference object) —
    * map-side only. */
  def withLshBuckets(df: DataFrame, planes: Array[Array[Float]],
                     bands: Int, bitsPerBand: Int,
                     vecCol: String = "embedding"): DataFrame = {
    df.withColumn("buckets",
        graft.functions.SketchFunctions.lshBuckets(col(vecCol), planes, bands, bitsPerBand))
      .select(col("*"), posexplode(col("buckets")).as(Seq("band", "bucket")))
      .drop("buckets")
  }

  // ----------------------------------------------- Random projection (JL)

  /** Deterministic Johnson–Lindenstrauss projection matrix: `outDim`
    * rows of `dim` iid N(0,1) weights — [[hyperplanes]] with one bit per
    * band, so the same splitmix64/Box–Muller generation, the same
    * bit-identical-across-engines guarantee, and the same SQL-bakeable
    * literal form the LSH oracles use. */
  def projectionPlanes(dim: Int, outDim: Int, seed: Long = 42L): Array[Array[Float]] =
    hyperplanes(dim, outDim, 1, seed)

  /** JL random projection: adds `projCol` = array<double> of
    * (vec · plane_p) / sqrt(outDim), p < outDim. Map-only (no shuffle,
    * codegen'd fused kernel): at 100 TB this is a pure scan-side
    * transform that cuts every downstream distance computation and
    * vector byte-read by dim/outDim (4x at 64→16) while distorting
    * pairwise distances by only 1±ε w.h.p. (outDim = O(log n / ε²)). */
  def randomProject(df: DataFrame, dim: Int, outDim: Int, seed: Long = 42L,
                    vecCol: String = "embedding",
                    projCol: String = "projected"): DataFrame = {
    require(outDim > 0 && outDim <= dim,
      s"outDim must be in (0, $dim], got $outDim")
    val planes = projectionPlanes(dim, outDim, seed)
    df.withColumn(projCol, graft.functions.SketchFunctions.planeProject(
      col(vecCol), planes, StrictMath.sqrt(outDim.toDouble)))
  }

  /** ANN via projected candidates + exact re-rank: rank the corpus by
    * cosine in the `outDim`-dim projected space (vectors cast to float —
    * the candidate pass reads outDim/dim of the bytes a full-dim pass
    * reads), then rescore the top `rerank` candidates per query with the
    * exact full-dim cosine (reads bounded by |queries|·rerank, broadcast
    * semi-join — the [[Pq.adcTopKRefined]] shape with a JL sketch in
    * place of PQ codes). Same all-pairs candidate guard story as
    * [[bruteForceTopK]]: compose with LSH/IVF over `projected` when the
    * corpus side outgrows a single scan. */
  def projectedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    rerank: Int, dim: Int, outDim: Int, seed: Long = 42L,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    def proj(df: DataFrame): DataFrame =
      randomProject(df, dim, outDim, seed, vecCol)
        .select(col(idCol), col("projected").cast("array<float>").as(vecCol))
    val cand = bruteForceTopK(proj(queries), proj(corpus), rerank, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(queries, corpus, cand, k, idCol, vecCol)
  }

  /** Candidate-pair count past which [[exactRerank]] stops collecting
    * the pairs to the driver: below it the literal-IN plan wins (reads
    * only may-match row groups); above it a 10⁴-query serving batch
    * would put ~500k pairs on the driver and a ~500k-element In in the
    * plan — pathological for filter eval and for the plan itself — so
    * the candidates stay DISTRIBUTED instead (see [[exactRerank]]). */
  private[operators] val MaxCollectCandidates = 100000

  /** Shared exact-rescore tail of the compressed-candidates paths
    * (JL projection, SQ8, PQ re-rank), with TWO regimes producing the
    * identical result (spec-pinned):
    *
    *  - SPOKEN/DRIVER batches (pairs ≤ `maxCollect`): the candidate
    *    pairs materialize on the driver — bounded by |queries|·rerank,
    *    the probed-cells collect class — so the rescore scan carries
    *    `id IN (…)` as a PUSHED literal predicate: at rest the exact
    *    pass reads only the may-match row groups of the corpus instead
    *    of re-scanning it (the second-full-scan shape a pure
    *    broadcast-join rescore pays, since runtime filters don't reach
    *    an unpartitioned parquet scan through a broadcast join).
    *  - SERVING batches (pairs > `maxCollect`): candidates stay
    *    distributed; a Bloom filter of the candidate ids prunes the
    *    corpus scan before its exchange ([[BloomJoin]]'s explicit
    *    runtime filter — false positives die in the exact join, false
    *    negatives can't occur), and the pairs shuffle-join the
    *    surviving vectors (one localCheckpoint so the size probe, the
    *    bloom build, and the join share ONE candidate-stage
    *    computation). No driver materialization, no literal list — the
    *    plan a 10⁴-query batch needs.
    *
    * The size probe is a plain `limit(maxCollect + 1)` collect: when it
    * returns ≤ maxCollect rows those ARE all the pairs — the SMALL
    * regime pays exactly one candidate-stage job, the same cost as the
    * collect it replaces (an earlier draft checkpointed before probing,
    * which taxed every spoken probe with the materialization — measured
    * +0.9s on x88 at sf1). One extra row proves the big regime, whose
    * checkpoint then re-runs the candidate stage once — amortized
    * against the batch that regime exists for. Exact cosine over the
    * pairs either way, then the same partial top-k aggregator ranks. */
  private[operators] def exactRerank(queries: DataFrame, corpus: DataFrame,
                                     cand: DataFrame, k: Int,
                                     idCol: String, vecCol: String,
                                     maxCollect: Int = MaxCollectCandidates): DataFrame = {
    val spark = corpus.sparkSession
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val pairsDf = cand.select(col("query_id"), col("neighbor_id"))
    // saturating +1: a caller pinning maxCollect = Int.MaxValue must not
    // overflow the limit into a negative (rejected) expression
    val probeN = if (maxCollect >= Int.MaxValue - 1) Int.MaxValue else maxCollect + 1
    val probe = pairsDf.limit(probeN).collect()
    val scored =
      if (probe.length <= maxCollect) {
        val pairs = probe.map(r => (r.getLong(0), r.getLong(1))).toSeq
        val candLit = spark.createDataFrame(pairs).toDF("query_id", "neighbor_id")
        val ids = pairs.map(_._2).distinct.sorted
        corpus
          .filter(col(idCol).isin(ids: _*))
          .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
          .join(broadcast(candLit), Seq("neighbor_id"))
          .join(broadcast(q), Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            cosineSim(col("q_vec"), col("c_vec")).as("score"))
      } else {
        val mat = pairsDf.localCheckpoint()
        val bloomed = corpus
          .filter(graft.functions.BloomFunctions.bloomMightContain(
            col(idCol), BloomJoin.buildBloom(mat, "neighbor_id"), 7))
          .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
        mat.join(bloomed, Seq("neighbor_id"))
          .join(broadcast(q), Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            cosineSim(col("q_vec"), col("c_vec")).as("score"))
      }
    topKPerQuery(scored, k)
  }

  // --------------------------------------------- Scalar quantization (SQ8)

  /** Symmetric per-vector int8 codes — the serving form of
    * [[quantizeInt8]]'s storage rows (identical code values: same
    * max-abs scale, same floor(x·127/mx + 0.5) rounding, spec-pinned
    * equal). Map-only fused codegen kernel
    * ([[graft.functions.Sq8Encode]] — the HOF formulation paid ~10s of
    * interpreted lambda evals at sf1); codes are integers in
    * [-127, 127] held in FLOAT (every value exact), so the pair
    * scoring runs through the codegen'd
    * [[graft.functions.CosineSimilarity]] kernel — its
    * double accumulations over integer-valued operands are sums of
    * exact integers ≤ 127²·dim, identical under ANY accumulation
    * order in either engine, which is what makes the SQ8 scores
    * replayable without pinning association. */
  private def sq8Coded(df: DataFrame, idAs: String, codesAs: String,
                       idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as(idAs),
      graft.functions.SketchFunctions.sq8Encode(col(vecCol)).as(codesAs))

  /** ANN via int8 scalar quantization + exact re-rank: candidates rank
    * by the quantized cosine — integer code dot over the product of
    * integer self-dot roots (per-vector scales CANCEL in cosine, so
    * the approximation error is rounding only, ~1/254 per coordinate;
    * a zero vector scores 0) — then the exact full-dim cosine rescores
    * the top `rerank` per query. The candidate pass reads 4x fewer
    * vector bytes than full-float at rest (codes are 1 byte/dim);
    * here codes are computed at scan time like x83's train-per-query
    * formulation — the at-rest form stores the code column. */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, k: Int, rerank: Int,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val q = sq8Coded(queries, "query_id", "q_codes", idCol, vecCol)
    val c = sq8Coded(corpus, "neighbor_id", "c_codes", idCol, vecCol)
    // the kernel's zero-denominator guard scores a zero vector 0.0 —
    // the same CASE the SQL replay spells out
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(col("q_codes"), col("c_codes")).as("score"))
    val cand = topKPerQuery(scored, rerank)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(queries, corpus, cand, k, idCol, vecCol)
  }

  // ------------------------------------------------------------------ IVF

  /** Deterministic centroid selection: the `k` corpus vectors with the
    * smallest ids (a k-means iteration would refine these; selection
    * stays deterministic and driver-side tiny either way). */
  def sampleCentroids(corpus: DataFrame, k: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Array[Array[Float]] =
    corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)

  /** Quantization scale for Lloyd refinement: a power of two, so
    * `x * Scale` only shifts the float's exponent — exact in double. */
  private[operators] val QuantScale = 1 << 20

  /** Fixed-iteration Lloyd's (spherical k-means) refinement of a seed
    * centroid set — deterministic AND cross-engine replayable:
    *
    *  - assignment is the same argmax-cosine (ties → smallest cell) the
    *    IVF kernel uses, computed in double by both engines;
    *  - each new centroid coordinate is `Σ floor(x·2^20) / (n·2^20)`:
    *    the per-dimension sums are exact integers (< 2^53), so they are
    *    identical under ANY accumulation order — the property plain
    *    double means lack and the reason quantization is here at all —
    *    and the single final division + float rounding are IEEE-identical
    *    in Spark and DuckDB;
    *  - an empty cell keeps its previous centroid.
    *
    * Cosine ranking is scale-invariant, so the un-normalized mean is a
    * valid spherical-k-means centroid. Driver traffic per iteration is
    * one `centroids × dim` collect. At 100 TB, refine on a deterministic
    * sample (e.g. smallest-N ids) — the quantized arithmetic is what
    * keeps that replayable too.
    *
    * Measured effect on the synthetic fixture (VectorFunctionsSpec):
    * recall@5 was already 0.93-1.0 with raw min-id seeds and stays level
    * after refinement; the concrete win is cell balance — size CV
    * 0.167→0.142 at sf0.01, 0.092→0.069 at sf0.1 — which tightens the
    * per-query scan-fraction bound the coarse quantizer exists for. */
  def refineCentroids(corpus: DataFrame, seeds: Array[Array[Float]],
                      iters: Int = 2,
                      vecCol: String = "embedding"): Array[Array[Float]] = {
    import graft.functions.SketchFunctions.nearestCentroids
    // spread: each iteration's argmax-cosine assignment is n·k·dim
    // kernel work; the quantized integer sums make the result identical
    // under any partitioning BY DESIGN, so parallelism is free here
    val wide = Parallelism.spreadToCores(corpus)
    var cents = seeds
    for (_ <- 0 until iters) {
      val sums = wide
        .select(col(vecCol).as("v"),
                nearestCentroids(col(vecCol), cents, 1)(0).as("cell"))
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(sum(floor(col("x").cast("double") * lit(QuantScale.toDouble)))
               .as("sq"),
             count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getLong(0))
      cents = cents.zipWithIndex.map { case (old, cell) =>
        sums.get(cell.toLong) match {
          case Some(rows) =>
            val next = old.clone()
            rows.foreach { r =>
              next(r.getInt(1)) =
                (r.getLong(2).toDouble / (r.getLong(3).toDouble * QuantScale)).toFloat
            }
            next
          case None => old
        }
      }
    }
    cents
  }

  /** IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    * their nearest centroid cell (map-side, one kernel call); each query
    * probes its `nprobe` nearest cells; candidates come from an equi-join
    * on cell id and are rescored exactly. The coarse quantizer bounds the
    * scanned fraction to ~nprobe/centroids of the corpus — the standard
    * billion-vector serving layout (cells ↔ partitions on a cluster).
    * Seeds (smallest ids) are refined by `refineIters` Lloyd passes —
    * deterministic and oracle-replayable, see [[refineCentroids]].
    *
    * Like [[lshTopK]], the default (sentinel -1) centroids/nprobe come
    * from [[calibrateIvf]] at [[DefaultTargetRecall]] — measured on this
    * corpus, not assumed from a fixture. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              centroids: Int = -1, nprobe: Int = -1, refineIters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.SketchFunctions.nearestCentroids
    val (nc, np) =
      if (centroids > 0 && nprobe > 0) (centroids, nprobe)
      else {
        val cal = calibrateIvf(corpus, DefaultTargetRecall, k,
                               idCol = idCol, vecCol = vecCol)
        (cal.centroids, cal.nprobe)
      }
    val cents = refineCentroids(
      corpus, sampleCentroids(corpus, nc, idCol, vecCol),
      refineIters, vecCol)
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("cell", nearestCentroids(col("c_vec"), cents, 1)(0))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("cell", explode(nearestCentroids(col("q_vec"), cents, np)))
    val scored = cb.join(broadcast(qb), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
              cosineSim(col("q_vec"), col("c_vec")).as("score"))
    topKPerQuery(scored, k)
  }

  /** Approximate top-k: candidates = corpus rows sharing any (band, bucket)
    * with the query, rescored exactly, deduped, top-k per query. Recall is
    * tunable via bands/bits; candidate generation is a hash equi-join on
    * (band, bucket) instead of a full cross product.
    *
    * DEFAULT PARAMETER PATH IS MEASURED, NOT ASSUMED: with bands/bits
    * left at their sentinel (-1), the operating point comes from
    * [[calibrateLsh]] at [[DefaultTargetRecall]] on a deterministic
    * corpus sample — a corpus with tighter or looser cosine geometry
    * gets parameters that measurably hit the target instead of silent
    * recall loss from a fixture-tuned constant. Pass explicit bands/bits
    * to pin an operating point (e.g. for oracle replay or a measured
    * production config). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bands: Int = -1, bitsPerBand: Int = -1, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (b, w) =
      if (bands > 0 && bitsPerBand > 0) (bands, bitsPerBand)
      else {
        val cal = calibrateLsh(corpus, DefaultTargetRecall, k,
                               idCol = idCol, vecCol = vecCol)
        (cal.bands, cal.bitsPerBand)
      }
    lshTopKAt(queries, corpus, k, b, w, dim, idCol, vecCol)
  }

  private def lshTopKAt(queries: DataFrame, corpus: DataFrame, k: Int,
                        bands: Int, bitsPerBand: Int, dim: Int,
                        idCol: String, vecCol: String): DataFrame = {
    val planes = hyperplanes(dim, bands, bitsPerBand)
    val qb = withLshBuckets(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
      planes, bands, bitsPerBand, "q_vec")
    val cb = withLshBuckets(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
      planes, bands, bitsPerBand, "c_vec")
    val candidates = cb.join(broadcast(qb), Seq("band", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_vec"), col("c_vec"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates.select(
      col("query_id"), col("neighbor_id"),
      cosineSim(col("q_vec"), col("c_vec")).as("score"))
    topKPerQuery(scored, k)
  }

  // ---------------------------------------------------------- calibration

  /** A measured LSH operating point: recall@k on the calibration sample
    * and the candidate fraction (scored pairs / all pairs) its bucketing
    * produced — the recall/cost trade made explicit. */
  final case class LshParams(bands: Int, bitsPerBand: Int,
                             recall: Double, candidateFraction: Double)

  /** A measured IVF operating point: recall@k and the fraction of the
    * corpus each query scans (probed-cell mass / corpus). */
  final case class IvfParams(centroids: Int, nprobe: Int,
                             recall: Double, scanFraction: Double)

  /** Recall target the parameterless operator entry points calibrate to
    * ([[lshTopK]]/[[ivfTopK]]/[[graft.operators.Dedup.embeddingPairsLsh]]
    * with sentinel defaults). */
  val DefaultTargetRecall = 0.7

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Driver-side mirrors of the cluster kernels, for the calibrators: the
    * grid search runs on the one collected bounded sample, so measuring
    * nine grid points costs zero Spark jobs — but every arithmetic step
    * (cosine accumulation order, sign-bucket test, argmax tie-break,
    * quantized Lloyd update) is kept literally identical to the
    * distributed kernels, so a measured recall/cost IS what the
    * corpus-scale operator does at that operating point (asserted against
    * Spark-measured quantities in CalibrationSpec). */
  private[operators] object InProcess {
    /** [[graft.functions.CosineSimilarity]]'s interpreted/codegen loop. */
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }

    /** [[graft.functions.SketchKernels.lshBuckets]]. */
    def lshBuckets(vec: Array[Float], planes: Array[Array[Float]],
                   bands: Int, bitsPerBand: Int): Array[Long] = {
      val out = new Array[Long](bands)
      var p = 0
      while (p < bands * bitsPerBand) {
        val plane = planes(p)
        var dot = 0.0
        var d = 0
        while (d < plane.length) {
          dot += vec(d).toDouble * plane(d).toDouble
          d += 1
        }
        if (dot > 0.0) out(p / bitsPerBand) |= 1L << (p % bitsPerBand)
        p += 1
      }
      out
    }

    /** [[graft.functions.SketchKernels.nearestCentroids]] — including its
      * zero-vector sentinel (-2.0, below any true cosine). */
    def nearestCells(vec: Array[Float], cents: Array[Array[Float]],
                     n: Int): Array[Int] = {
      val k = cents.length
      val sims = new Array[Double](k)
      var c = 0
      while (c < k) {
        val cent = cents(c)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var d = 0
        while (d < cent.length) {
          val x = vec(d).toDouble; val y = cent(d).toDouble
          dot += x * y; na += x * x; nb += y * y
          d += 1
        }
        val denom = math.sqrt(na) * math.sqrt(nb)
        sims(c) = if (denom == 0.0) -2.0 else dot / denom
        c += 1
      }
      Array.range(0, k).sortBy(i => (-sims(i), i)).take(math.min(n, k))
    }

    /** Exact top-k neighbor ids by (cosine desc, id asc) — [[TopK]]'s
      * comparator — excluding the query itself. */
    def topKIds(q: (Long, Array[Float]),
                cands: Iterator[(Long, Array[Float])], k: Int): Set[Long] =
      cands.filter(_._1 != q._1)
        .map { case (id, v) => (id, cosine(q._2, v)) }
        .toSeq.sortBy { case (id, s) => (-s, id) }
        .take(k).map(_._1).toSet

    /** [[Similarity.refineCentroids]]'s quantized Lloyd update over the
      * sample: the per-dimension sums are exact integers (order-free, the
      * point of the quantization), and the final division + float
      * rounding replicate the collected Spark rows bit for bit. */
    def refine(entries: Array[(Long, Array[Float])],
               seeds: Array[Array[Float]], iters: Int): Array[Array[Float]] = {
      var cents = seeds
      for (_ <- 0 until iters) {
        val byCell = entries.groupBy(e => nearestCells(e._2, cents, 1)(0))
        cents = cents.zipWithIndex.map { case (old, cell) =>
          byCell.get(cell) match {
            case Some(rows) =>
              val next = old.clone()
              var d = 0
              while (d < next.length) {
                var sq = 0L
                rows.foreach { r =>
                  sq += math.floor(r._2(d).toDouble * QuantScale.toDouble).toLong
                }
                next(d) = (sq.toDouble / (rows.length.toDouble * QuantScale)).toFloat
                d += 1
              }
              next
            case None => old
          }
        }
      }
      cents
    }
  }

  /** Collect the deterministic calibration sample: the `nSample`
    * smallest-id vectors, id-ordered (no RNG — the same corpus always
    * calibrates to the same answer). */
  private def collectSample(corpus: DataFrame, nSample: Int,
                            idCol: String, vecCol: String): Array[(Long, Array[Float])] =
    corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(nSample).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)

  /** Pick (bands, bitsPerBand) for [[lshTopK]] from a DETERMINISTIC
    * sample so the chosen operating point hits `targetRecall` on the
    * corpus's OWN cosine distribution — the fixture-tuned defaults above
    * assume neighbors near cosine 0.3 and mis-size on corpora with
    * tighter or looser neighborhoods.
    *
    * Recipe: the `nSample` smallest-id vectors form the calibration
    * corpus and the first `nQueries` of them the query set (id-ordered —
    * no RNG, so the same corpus always calibrates to the same answer);
    * ground truth is the exact top-k; every grid point measures real
    * recall AND the real candidate fraction its buckets induce; the
    * cheapest point meeting the target wins (ties → fewer candidates).
    * If NO grid point reaches the target, the highest-recall point is
    * returned and a warning is logged — callers needing a hard guarantee
    * must check `.recall` on the result.
    *
    * Cost: ONE bounded Spark job (the sample collect); the grid loop is
    * in-process over the [[InProcess]] kernel mirrors — identical
    * arithmetic to the distributed operators, measured in
    * CalibrationSpec — so calibration adds no per-grid-point job
    * overhead (the previous formulation's dominant cost at ~4 jobs per
    * point). */
  def calibrateLsh(corpus: DataFrame, targetRecall: Double, k: Int = 5,
                   nQueries: Int = 8, nSample: Int = 512,
                   grid: Seq[(Int, Int)] =
                     for (b <- Seq(4, 8, 16); w <- Seq(4, 6, 8)) yield (b, w),
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): LshParams = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"target recall out of (0,1]: $targetRecall")
    val entries = collectSample(corpus, nSample, idCol, vecCol)
    val n = entries.length
    val dim = if (n == 0) 0 else entries.head._2.length
    val queries = entries.take(nQueries)
    val truth = queries
      .map(q => q._1 -> InProcess.topKIds(q, entries.iterator, k))
      .filter(_._2.nonEmpty).toMap
    val totalTruth = math.max(1, truth.valuesIterator.map(_.size).sum)
    val measured = grid.map { case (bands, bits) =>
      val planes = hyperplanes(dim, bands, bits)
      val buckets = entries.map(e => InProcess.lshBuckets(e._2, planes, bands, bits))
      // band → bucket → entry indexes (the (band, bucket) equi-join)
      val byBand = Array.tabulate(bands) { b =>
        val m = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
        var i = 0
        while (i < n) {
          m.getOrElseUpdate(buckets(i)(b),
            scala.collection.mutable.ArrayBuffer.empty[Int]) += i
          i += 1
        }
        m
      }
      var candTotal = 0L
      var hits = 0
      queries.zipWithIndex.foreach { case (q, qi) =>
        val cand = scala.collection.mutable.HashSet.empty[Int]
        var b = 0
        while (b < bands) {
          byBand(b).get(buckets(qi)(b)).foreach(_.foreach(cand += _))
          b += 1
        }
        cand -= qi
        candTotal += cand.size
        val top = InProcess.topKIds(q, cand.iterator.map(entries(_)), k)
        hits += (truth.getOrElse(q._1, Set.empty[Long]) intersect top).size
      }
      LshParams(bands, bits, hits.toDouble / totalTruth,
        candTotal.toDouble / math.max(1L, truth.size.toLong * (n - 1)))
    }
    measured.filter(_.recall >= targetRecall)
      .sortBy(p => (p.candidateFraction, -p.recall))
      .headOption
      .getOrElse {
        val best = measured.maxBy(_.recall)
        log.warn(s"calibrateLsh: no grid point reaches target recall " +
          s"$targetRecall on this corpus (best: $best over ${grid.size} " +
          "points) — returning the highest-recall point; widen the grid " +
          "or lower the target for a guaranteed hit")
        best
      }
  }

  /** IVF twin of [[calibrateLsh]]: pick (centroids, nprobe) from the same
    * deterministic sample — one bounded collect, in-process grid loop
    * (kernel-mirror arithmetic, including the quantized Lloyd
    * refinement). The scan fraction is MEASURED — the mass of the cells
    * each query actually probes over the sample size — not the
    * balanced-cell nprobe/centroids approximation. Same fallback contract
    * as [[calibrateLsh]]: an unreachable target logs a warning and
    * returns the highest-recall point. Throws when no grid point is
    * admissible at all (every centroid count exceeds the sample). */
  def calibrateIvf(corpus: DataFrame, targetRecall: Double, k: Int = 5,
                   nQueries: Int = 8, nSample: Int = 512,
                   centroidGrid: Seq[Int] = Seq(8, 16, 32),
                   nprobeGrid: Seq[Int] = Seq(1, 2, 4),
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): IvfParams = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"target recall out of (0,1]: $targetRecall")
    val entries = collectSample(corpus, nSample, idCol, vecCol)
    val n = entries.length
    val queries = entries.take(nQueries)
    val truth = queries
      .map(q => q._1 -> InProcess.topKIds(q, entries.iterator, k))
      .filter(_._2.nonEmpty).toMap
    val totalTruth = math.max(1, truth.valuesIterator.map(_.size).sum)
    val measured = for (c <- centroidGrid; if c <= n; p <- nprobeGrid; if p <= c)
      yield {
        val cents = InProcess.refine(entries, entries.take(c).map(_._2), 2)
        val cellOf = entries.map(e => InProcess.nearestCells(e._2, cents, 1)(0))
        val cellSizes = cellOf.groupBy(identity).map { case (cell, xs) => cell -> xs.length }
        var probedMass = 0L
        var hits = 0
        queries.zipWithIndex.foreach { case (q, qi) =>
          val probed = InProcess.nearestCells(q._2, cents, p).toSet
          probedMass += probed.iterator.map(cellSizes.getOrElse(_, 0).toLong).sum
          val cand = entries.indices.iterator
            .filter(i => i != qi && probed.contains(cellOf(i)))
            .map(entries(_))
          val top = InProcess.topKIds(q, cand, k)
          hits += (truth.getOrElse(q._1, Set.empty[Long]) intersect top).size
        }
        IvfParams(c, p, hits.toDouble / totalTruth,
          probedMass.toDouble / math.max(1L, truth.size.toLong * n))
      }
    require(measured.nonEmpty,
      s"calibrateIvf: no admissible grid point — the sample has $n vectors " +
      s"but centroidGrid=${centroidGrid.mkString("[", ",", "]")} (every " +
      "centroid count must be ≤ the sample size; shrink the grid or raise " +
      "nSample)")
    measured.filter(_.recall >= targetRecall)
      .sortBy(p => (p.scanFraction, -p.recall))
      .headOption
      .getOrElse {
        val best = measured.maxBy(_.recall)
        log.warn(s"calibrateIvf: no grid point reaches target recall " +
          s"$targetRecall on this corpus (best: $best) — returning the " +
          "highest-recall point; widen the grid or lower the target")
        best
      }
  }

  /** Symmetric per-vector int8 quantization — the storage-compression
    * step of an embedding pipeline (4× smaller than float32, 8× than
    * float64; recall cost is measured, not assumed — see
    * SimilaritySpec). Each component maps to
    * `floor(x · 127 / max|x| + 0.5)` ∈ [-127, 127] with the per-vector
    * scale kept alongside for dequantization (`q · scale ≈ x`).
    *
    * Output is exploded to (vec_id, pos, q, scale) rows: stateless
    * map-side work that scales with scan bandwidth, and — because
    * float→double widening, the multiply/divide chain, and
    * `floor(x + 0.5)` (half-up) are all IEEE-exact single-rounding ops
    * evaluated in the same order in any engine — bit-replayable by the
    * DuckDB oracle. The all-zero vector quantizes to zeros with scale 0.
    */
  def quantizeInt8(embeddings: DataFrame,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val vecD = transform(col(vecCol), x => x.cast("double"))
    val mx = array_max(transform(vecD, x => abs(x)))
    embeddings
      .select(col(idCol).as("vec_id"), vecD.as("v"), mx.as("mx"))
      .select(col("vec_id"),
              posexplode(col("v")).as(Seq("pos", "x")),
              col("mx"))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
              when(col("mx") === 0.0, 0L)
                .otherwise(floor(col("x") * lit(127.0) / col("mx") + lit(0.5)))
                .cast("long").as("q"),
              round(when(col("mx") === 0.0, 0.0)
                .otherwise(col("mx") / lit(127.0)), 6).as("scale"))
  }
}
