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
    * @return (query_id, neighbor_id, rank, score) with rank 1..k by
    *         (score desc, neighbor_id asc)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val pairs0 = c.crossJoin(broadcast(q))
    val pairs = if (excludeSelf) pairs0.filter(col("neighbor_id") =!= col("query_id")) else pairs0
    val scored = pairs.select(
      col("query_id"), col("neighbor_id"),
      cosineSim(col("q_vec"), col("c_vec")).as("score"))
    topKPerQuery(scored, k)
  }

  /** Reduce scored (query_id, neighbor_id, score) pairs to ranked top-k per
    * query via the map-side partial aggregator. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
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
  private val QuantScale = 1 << 20

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
    var cents = seeds
    for (_ <- 0 until iters) {
      val sums = corpus
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
    * deterministic and oracle-replayable, see [[refineCentroids]]. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              centroids: Int = 16, nprobe: Int = 4, refineIters: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.SketchFunctions.nearestCentroids
    val cents = refineCentroids(
      corpus, sampleCentroids(corpus, centroids, idCol, vecCol),
      refineIters, vecCol)
    val cb = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .withColumn("cell", nearestCentroids(col("c_vec"), cents, 1)(0))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .withColumn("cell", explode(nearestCentroids(col("q_vec"), cents, nprobe)))
    val scored = cb.join(broadcast(qb), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
              cosineSim(col("q_vec"), col("c_vec")).as("score"))
    topKPerQuery(scored, k)
  }

  /** Approximate top-k: candidates = corpus rows sharing any (band, bucket)
    * with the query, rescored exactly, deduped, top-k per query. Recall is
    * tunable via bands/bits; candidate generation is a hash equi-join on
    * (band, bucket) instead of a full cross product. */
  /** Default band/bit sizing: for neighbors at cosine ≈ 0.3 (typical for
    * high-dim embeddings), per-plane agreement p = 1-θ/π ≈ 0.6, so 8 bands
    * × 6 bits gives recall ≈ 1-(1-p⁶)⁸ ≈ 0.33 while scanning ~L/2^b ≈ 12%
    * of the corpus per query. Raise bands for recall, bits for selectivity. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bands: Int = 8, bitsPerBand: Int = 6, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
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

  /** Measured recall of `approx` (query_id, neighbor_id, …) against the
    * exact `truth` top-k sets: |found ∩ true| / |true| summed over
    * queries. */
  private def recallOf(truth: Map[Long, Set[Long]],
                       approx: DataFrame): Double = {
    val got = approx.select(col("query_id"), col("neighbor_id")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hit = truth.map { case (q, t) =>
      (t intersect got.getOrElse(q, Set.empty)).size }.sum
    hit.toDouble / math.max(1, truth.map(_._2.size).sum)
  }

  /** Pick (bands, bitsPerBand) for [[lshTopK]] from a DETERMINISTIC
    * sample so the chosen operating point hits `targetRecall` on the
    * corpus's OWN cosine distribution — the fixture-tuned defaults above
    * assume neighbors near cosine 0.3 and mis-size on corpora with
    * tighter or looser neighborhoods.
    *
    * Recipe (the VectorFunctionsSpec measurement, packaged): the
    * `nSample` smallest-id vectors form the calibration corpus and the
    * first `nQueries` of them the query set (id-ordered — no RNG, so the
    * same corpus always calibrates to the same answer); ground truth is
    * the exact [[bruteForceTopK]]; every grid point measures real recall
    * AND the real candidate fraction its buckets induce; the cheapest
    * point meeting the target wins (ties → fewer candidates), falling
    * back to the highest-recall point with a require if nothing reaches
    * it. Sample-sized work only — grid × O(nSample²) at the default 512
    * ≈ a few million cosine ops, driver-negligible next to the corpus
    * job it parameterizes. */
  def calibrateLsh(corpus: DataFrame, targetRecall: Double, k: Int = 5,
                   nQueries: Int = 8, nSample: Int = 512,
                   grid: Seq[(Int, Int)] =
                     for (b <- Seq(4, 8, 16); w <- Seq(4, 6, 8)) yield (b, w),
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): LshParams = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"target recall out of (0,1]: $targetRecall")
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(nSample).cache()
    try {
      val queries = sample.orderBy(col(idCol)).limit(nQueries)
      val n = sample.count()
      val dim = sample.select(size(col(vecCol))).head().getInt(0)
      val truth = bruteForceTopK(queries, sample, k, idCol, vecCol)
        .select(col("query_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val measured = grid.map { case (bands, bits) =>
        val planes = hyperplanes(dim, bands, bits)
        val qb = withLshBuckets(
          queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
          planes, bands, bits, "q_vec")
          .select(col("query_id"), col("band"), col("bucket"))
        val cb = withLshBuckets(
          sample.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec")),
          planes, bands, bits, "c_vec")
          .select(col("neighbor_id"), col("band"), col("bucket"))
        val cand = cb.join(broadcast(qb), Seq("band", "bucket"))
          .filter(col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id")).distinct().count()
        val frac = cand.toDouble / math.max(1L, truth.size.toLong * (n - 1))
        LshParams(bands, bits,
          recallOf(truth, lshTopK(queries, sample, k, bands, bits, dim,
                                  idCol, vecCol)), frac)
      }
      measured.filter(_.recall >= targetRecall)
        .sortBy(p => (p.candidateFraction, -p.recall))
        .headOption
        .getOrElse(measured.maxBy(_.recall))
    } finally { sample.unpersist(); () }
  }

  /** IVF twin of [[calibrateLsh]]: pick (centroids, nprobe) from the same
    * deterministic sample. The scan fraction is MEASURED — the mass of
    * the cells each query actually probes over the sample size — not the
    * balanced-cell nprobe/centroids approximation. */
  def calibrateIvf(corpus: DataFrame, targetRecall: Double, k: Int = 5,
                   nQueries: Int = 8, nSample: Int = 512,
                   centroidGrid: Seq[Int] = Seq(8, 16, 32),
                   nprobeGrid: Seq[Int] = Seq(1, 2, 4),
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): IvfParams = {
    import graft.functions.SketchFunctions.nearestCentroids
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"target recall out of (0,1]: $targetRecall")
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(nSample).cache()
    try {
      val queries = sample.orderBy(col(idCol)).limit(nQueries)
      val n = sample.count()
      val truth = bruteForceTopK(queries, sample, k, idCol, vecCol)
        .select(col("query_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val measured = for (c <- centroidGrid; if c <= n; p <- nprobeGrid; if p <= c)
        yield {
          val cents = refineCentroids(
            sample, sampleCentroids(sample, c, idCol, vecCol), 2, vecCol)
          val cellSizes = sample
            .select(nearestCentroids(col(vecCol), cents, 1)(0).as("cell"))
            .groupBy(col("cell")).agg(count(lit(1)).as("sz")).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          val probedMass = queries
            .select(explode(nearestCentroids(col(vecCol), cents, p)).as("cell"))
            .collect().map(r => cellSizes.getOrElse(r.getLong(0), 0L)).sum
          IvfParams(c, p,
            recallOf(truth, ivfTopK(queries, sample, k, c, p, 2, idCol, vecCol)),
            probedMass.toDouble / math.max(1L, truth.size.toLong * n))
        }
      measured.filter(_.recall >= targetRecall)
        .sortBy(p => (p.scanFraction, -p.recall))
        .headOption
        .getOrElse(measured.maxBy(_.recall))
    } finally { sample.unpersist(); () }
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
