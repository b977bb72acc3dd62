package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.PqFunctions.{binaryBytes, pqAdc, pqEncode, pqLut}

/** Product quantization: trained codebooks, vector→code-word encoding,
  * and ADC (asymmetric distance computation) top-k — the compressed
  * serving path beside [[Similarity]]'s exact and IVF formulations.
  *
  * Training follows [[Similarity.refineCentroids]]'s replayable recipe
  * per subspace: seeds are the `ksub` smallest-id vectors' slices, each
  * iteration reassigns by Euclidean distance (ties → smaller code — the
  * ranking DuckDB's `ORDER BY list_distance ASC, code ASC` produces)
  * and recenters with the quantized mean `Σ floor(x·2²⁰) / (n·2²⁰)`,
  * whose integer sums are accumulation-order-independent — the property
  * that makes distributed training bit-replayable in SQL. An empty code
  * keeps its previous entry.
  *
  * Scale shape: training is `iters` map-side kernel passes + one
  * `m·ksub·subDim`-row collect each (KiBs — at 100 TB you train on a
  * deterministic smallest-N-id sample, same contract as the IVF coarse
  * quantizer); encoding is one codegen'd kernel call per row; ADC search
  * broadcasts queries WITH their precomputed lookup tables and streams
  * the `m`-byte codes — the corpus never shuffles and the scan reads
  * `m` bytes per vector instead of `4·dim` floats. Reference behavior
  * context: the reference pipeline has no vector ops at all
  * (agentic_workflow_transformation.py handles tabular CSV only); this
  * family is part of the engine's 100 TB extension surface.
  */
object Pq {

  /** `flat(s·ksub+j)` = codebook entry j of subspace s, each `subDim`
    * floats; `m·subDim` must equal the embedding dimension. */
  final case class PqCodebooks(m: Int, ksub: Int, subDim: Int,
                               flat: Array[Array[Float]]) {
    require(flat.length == m * ksub,
      s"expected ${m * ksub} codebook entries, got ${flat.length}")
    require(flat.forall(_.length == subDim),
      s"every codebook entry must have $subDim dims")
  }

  /** Operating point for a PQ layer: `m` subspaces × `ksub` codes,
    * `iters` quantized-Lloyd refinements. */
  final case class PqParams(m: Int, ksub: Int, iters: Int = 2) {
    require(m > 0 && ksub > 0 && ksub <= 256 && iters >= 0,
      s"need m>0, 0<ksub<=256, iters>=0; got m=$m ksub=$ksub iters=$iters")
  }

  /** Seed codebooks: the `ksub` smallest-id vectors, sliced per
    * subspace (the deterministic, sample-free analogue of
    * [[Similarity.sampleCentroids]]). */
  def sliceSeeds(corpus: DataFrame, m: Int, ksub: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): PqCodebooks = {
    val rows = corpus.orderBy(col(idCol)).limit(ksub)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(rows.nonEmpty, "cannot seed PQ codebooks from an empty corpus")
    val dim = rows(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    require(rows.length == ksub,
      s"corpus has ${rows.length} vectors, need >= ksub=$ksub to seed")
    val subDim = dim / m
    val flat = Array.tabulate(m * ksub) { idx =>
      val s = idx / ksub; val j = idx % ksub
      java.util.Arrays.copyOfRange(rows(j), s * subDim, (s + 1) * subDim)
    }
    PqCodebooks(m, ksub, subDim, flat)
  }

  /** Train per-subspace codebooks: slice seeds + `iters` distributed
    * quantized-Lloyd passes (assign all subspaces in ONE kernel call per
    * row, regroup exploded dims by (subspace, code) — one bounded
    * `m·ksub·subDim`-row collect per iteration).
    *
    * Shape note (round 22, measured): a rework exploding to `m`
    * subspace rows carrying quantized-long slices (8× fewer rows into
    * the aggregate, per-position map-side long sums) measured ~7%
    * SLOWER at sf1/32c (x83 8.19→8.78s) — the per-row nested
    * struct/array allocation costs more than the codegen'd flat
    * posexplode + narrow hash-agg it replaced. Kept in this form;
    * numbers in OPTIMIZATION_r22.md. */
  def train(corpus: DataFrame, m: Int, ksub: Int, iters: Int = 2,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): PqCodebooks = {
    var cb = sliceSeeds(corpus, m, ksub, idCol, vecCol)
    val wide = Parallelism.spreadToCores(corpus)
    for (_ <- 0 until iters) {
      val sums = wide
        .select(col(vecCol).as("v"),
                binaryBytes(pqEncode(col(vecCol), cb.flat, m, ksub)).as("cs"))
        .select(col("cs"), posexplode(col("v")).as(Seq("d", "x")))
        .select(
          floor(col("d") / lit(cb.subDim)).cast("int").as("s"),
          (col("d") % lit(cb.subDim)).as("dl"),
          col("x"), col("cs"))
        .withColumn("code", // signed-byte → unsigned code index
          pmod(element_at(col("cs"), col("s") + 1).cast("int"), lit(256)))
        .groupBy(col("s"), col("code"), col("dl"))
        .agg(sum(floor(col("x").cast("double") *
               lit(Similarity.QuantScale.toDouble))).as("sq"),
             count(lit(1)).as("n"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
      val next = cb.flat.zipWithIndex.map { case (old, idx) =>
        sums.get((idx / ksub, idx % ksub)) match {
          case Some(rows) =>
            val e = old.clone()
            rows.foreach { r =>
              e(r.getInt(2)) = (r.getLong(3).toDouble /
                (r.getLong(4).toDouble * Similarity.QuantScale)).toFloat
            }
            e
          case None => old
        }
      }
      cb = PqCodebooks(m, ksub, cb.subDim, next)
    }
    cb
  }

  /** Add the `m`-byte code word column (one codegen'd kernel call per
    * row; at rest this is the 4·dim/m compression the whole family
    * exists for). */
  def encode(df: DataFrame, cb: PqCodebooks, vecCol: String = "embedding",
             outCol: String = "codes"): DataFrame =
    df.withColumn(outCol, pqEncode(col(vecCol), cb.flat, cb.m, cb.ksub))

  /** ADC top-k: queries (small — broadcast) precompute their lookup
    * tables once; every corpus code word scores with `m` array lookups;
    * ranking reduces through the map-side partial top-k aggregator. The
    * score is the quantized INNER PRODUCT (the classical MIPS-flavored
    * ADC); on normalized embeddings it orders like cosine. Exactness is
    * not the contract — [[Similarity.bruteForceTopK]] is the exact
    * twin; PQ trades recall for a 4·dim/m smaller candidate scan. */
  def adcTopK(queries: DataFrame, corpus: DataFrame, cb: PqCodebooks,
              k: Int, idCol: String = "vec_id",
              vecCol: String = "embedding",
              excludeSelf: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val c = encode(corpus, cb, vecCol)
      .select(col(idCol).as("neighbor_id"), col("codes"))
    val q = queries.select(col(idCol).as("query_id"),
                           pqLut(col(vecCol), cb.flat, cb.m, cb.ksub).as("lut"))
    val pairs0 = c.crossJoin(broadcast(q))
    val pairs = if (excludeSelf)
      pairs0.filter(col("neighbor_id") =!= col("query_id")) else pairs0
    val scored = pairs.select(col("query_id"), col("neighbor_id"),
      pqAdc(col("lut"), col("codes"), cb.m, cb.ksub).as("score"))
    Similarity.topKPerQuery(scored, k)
  }

  /** ADC + exact re-rank (Jégou et al.'s IVFADC+R refinement): rank the
    * whole corpus by the compressed codes, then rescore only the top
    * `rerank` candidates per query with the exact cosine. The float
    * vectors are read for `|queries|·rerank` rows instead of the corpus
    * — a broadcast semi-join against the candidate list, so the second
    * pass stays map-side. `rerank >= |corpus|` degenerates to exact
    * brute force (spec-pinned equivalence). */
  def adcTopKRefined(queries: DataFrame, corpus: DataFrame,
                     cb: PqCodebooks, k: Int, rerank: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(rerank >= k, s"rerank=$rerank must be >= k=$k")
    val cand = adcTopK(queries, corpus, cb, rerank, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    // bounded-collect rescore: the exact pass reads only the may-match
    // row groups (pushed IN), never a second full corpus scan
    Similarity.exactRerank(queries, corpus, cand, k, idCol, vecCol)
  }
}
