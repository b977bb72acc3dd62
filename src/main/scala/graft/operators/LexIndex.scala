package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Persisted inverted index — the at-rest serving form of BM25
  * ([[Retrieval.bm25TopK]] is the per-query scan form), shaped by the
  * same at-rest discipline as the vector index ([[IvfIndex]]):
  *
  *  - postings `(term, doc_id, tf, dl)` live in TERM-BUCKET-partitioned
  *    parquet segments (`tb = murmur3(term) mod buckets`), files sorted
  *    by term so a probed bucket row-group-skips to its terms;
  *  - a probe reads ONLY the query terms' buckets — the lexical
  *    analogue of the IVF cell pruning: cost is bounded by the probed
  *    terms' posting bytes, never the corpus (at 100 TB a dozen query
  *    terms touch a dozen of the ~thousands of bucket partitions);
  *  - corpus totals (N docs, Σ doc length — the BM25 stats) are EXACT
  *    INTEGERS in the manifest (`stats=` line), so a probe reconstructs
  *    the bit-identical avgdl division without touching the corpus;
  *  - segments land behind an atomic versioned manifest rename
  *    (`lex-manifest-<v>.txt`, newest wins): append publishes one new
  *    segment + summed stats, a crash anywhere leaves the old index
  *    serving, and a racing appender loses the rename loudly
  *    ([[ManifestedLog.ConcurrentWriteException]]) and retries against
  *    the winner.
  *
  * Because tf/dl/N/Σdl are stored exactly and scoring runs through
  * [[Retrieval.scoreAndRank]] — the SAME tail as the flat scan — an
  * index probe is score-IDENTICAL to `bm25TopK` over the indexed
  * corpus (spec-pinned in LexIndexSpec, hash-pinned by x100 sharing
  * x98's oracle replay).
  */
object LexIndex {

  private val ManifestRe = "lex-manifest-(\\d{9})\\.txt".r
  private val Header = "graft-lex-index-manifest-v1"

  /** Default term-bucket count: enough spread that a probe's bucket
    * subset is selective, few enough that small corpora don't shatter
    * into empty files. A production build sizes this ~√|vocabulary|. */
  val DefaultBuckets = 64

  /** Past this many probed terms the `tb IN (…)`/`term IN (…)` literal
    * filters are dropped (the [[IvfIndex.MaxProbedCellLiterals]]
    * treatment): the equi-join with the query terms keeps the RESULT
    * identical — the literals are a plan-only pruning optimization. */
  private[operators] val MaxProbedTermLiterals = 2048

  final case class LexManifest(version: Long, segments: Seq[String],
                               buckets: Int, nDocs: Long, sumDl: Long)

  /** Term → bucket: a pure Scala splitmix64 char fold, used through a
    * UDF at BUILD time (one-time indexing cost — the hot probe path
    * never evaluates it per row) and called directly on the driver at
    * probe time to turn query terms into partition literals. One
    * function on both sides — bucket agreement is by construction, not
    * by replicating a codegen hash bit-for-bit on the driver. */
  private[operators] def termBucket(term: String, buckets: Int): Int = {
    var h = 0x9e3779b97f4a7c15L
    var i = 0
    while (i < term.length) {
      h = graft.functions.SketchKernels.mix64(h ^ term.charAt(i).toLong)
      i += 1
    }
    math.floorMod(h, buckets.toLong).toInt
  }

  private def fs(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val postingsSchema = StructType.fromDDL(
    "term STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, tb INT")

  // ----------------------------------------------------------- manifest

  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val root = new Path(path)
    val f = fs(spark, root)
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).map(_.getPath.getName).collect {
      case ManifestRe(v) => v.toLong
    }.sorted.toSeq
  }

  def readManifest(spark: SparkSession, path: String): LexManifest = {
    val v = versions(spark, path).lastOption.getOrElse(
      sys.error(s"no lex manifest under $path — not a lexical index"))
    val root = new Path(path)
    val f = fs(spark, root)
    val in = f.open(new Path(root, f"lex-manifest-$v%09d.txt"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val lines = text.linesIterator.toList
    require(lines.headOption.contains(Header), s"$path is not a $Header index")
    val entries = lines.drop(1).filter(_.nonEmpty)
    val stats = entries.collectFirst { case s if s.startsWith("stats=") =>
      s.stripPrefix("stats=").split(',') match {
        case Array(n, sd) => (n.toLong, sd.toLong)
        case _ => sys.error(s"unparseable stats line in $path manifest $v")
      }
    }.getOrElse(sys.error(s"lex manifest $v under $path has no stats line"))
    val buckets = entries.collectFirst { case s if s.startsWith("buckets=") =>
      s.stripPrefix("buckets=").toInt
    }.getOrElse(sys.error(s"lex manifest $v under $path has no buckets line"))
    val segs = entries.filterNot(s =>
      s.startsWith("stats=") || s.startsWith("buckets="))
    LexManifest(v, segs, buckets, stats._1, stats._2)
  }

  private def publish(spark: SparkSession, root: Path, m: LexManifest): Unit = {
    val f = fs(spark, root)
    val target = new Path(root, f"lex-manifest-${m.version}%09d.txt")
    if (f.exists(target)) throw ConcurrentWriteException(
      s"lex manifest version ${m.version} already exists under $root")
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(root, s".lex-manifest-${m.version}-$token.tmp")
    val out = f.create(tmp, true)
    try out.write(
      (Seq(Header, s"stats=${m.nDocs},${m.sumDl}", s"buckets=${m.buckets}") ++
        m.segments).mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw ConcurrentWriteException(s"publishing $target lost a race")
    }
  }

  // ------------------------------------------------------------- build

  /** Postings + exact stats of one document batch. The postings
    * aggregation is the indexing cost — ONE corpus tokenize +
    * (doc, term) shuffle, paid at build so probes never pay it. */
  private def postingsOf(docs: DataFrame, buckets: Int,
                         idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      Dedup.tokens(col(textCol)).as("toks"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count("*").as("tf"), max("dl").as("dl"))
      .withColumn("tb",
        udf((t: String) => termBucket(t, buckets)).apply(col("term")))
      .select("term", "doc_id", "tf", "dl", "tb")
  }

  private def writeSegment(spark: SparkSession, root: Path, name: String,
                           postings: DataFrame): Unit =
    postings
      // term-sorted files inside each bucket partition: a probed bucket
      // row-group-skips straight to its terms via the pushed term filter
      .repartition(col("tb")).sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").partitionBy("tb")
      .parquet(new Path(root, name).toString)

  /** Build (or rebuild) the index: one postings segment, stats from the
    * same batch, one atomic manifest flip. Returns the version. */
  def build(docs: DataFrame, path: String,
            buckets: Int = DefaultBuckets,
            idCol: String = "doc_id", textCol: String = "text"): Long = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    val root = new Path(path)
    val version = versions(spark, path).lastOption.getOrElse(0L) + 1
    val seg = f"seg-$version%09d"
    writeSegment(spark, root, seg,
      postingsOf(docs, buckets, idCol, textCol))
    val st = docs.select(col(idCol),
        size(Dedup.tokens(col(textCol))).cast("long").as("dl"))
      .agg(count("*"), coalesce(sum("dl"), lit(0L))).head()
    publish(spark, root,
      LexManifest(version, Seq(seg), buckets, st.getLong(0), st.getLong(1)))
    version
  }

  /** Append a document batch: one new segment of the batch's postings,
    * stats summed (exact integer addition — order-free), one atomic
    * flip — cost ∝ batch, the ingest-screen shape. Batch doc ids must
    * be new (same contract as [[IvfIndex.append]]). Retries once
    * against a racing appender's published manifest. */
  def append(docs: DataFrame, path: String,
             idCol: String = "doc_id", textCol: String = "text"): Long = {
    val spark = docs.sparkSession
    val root = new Path(path)
    def attempt(): Long = {
      val m = readManifest(spark, path)
      val version = m.version + 1
      val token = java.util.UUID.randomUUID().toString.take(8)
      val seg = f"seg-$version%09d-$token"
      writeSegment(spark, root, seg,
        postingsOf(docs, m.buckets, idCol, textCol))
      val st = docs.select(col(idCol),
          size(Dedup.tokens(col(textCol))).cast("long").as("dl"))
        .agg(count("*"), coalesce(sum("dl"), lit(0L))).head()
      publish(spark, root, LexManifest(version, m.segments :+ seg,
        m.buckets, m.nDocs + st.getLong(0), m.sumDl + st.getLong(1)))
      version
    }
    try attempt() catch { case _: ConcurrentWriteException => attempt() }
  }

  // -------------------------------------------------------------- read

  /** Every posting of the newest manifest (diagnostics / CLI display). */
  def readPostings(spark: SparkSession, path: String): DataFrame =
    readPostingsWith(spark, path, readManifest(spark, path))

  private def readPostingsWith(spark: SparkSession, path: String,
                               m: LexManifest): DataFrame = {
    val root = new Path(path)
    m.segments.map(s => spark.read.schema(postingsSchema)
        .parquet(new Path(root, s).toString))
      .reduce(_.unionByName(_))
  }

  // ------------------------------------------------------------- probe

  /** BM25 top-k from the index: reads ONLY the query terms' bucket
    * partitions (plus the pushed `term IN (…)` row-group filter), then
    * the shared scoring tail. df per term counts over the pruned
    * postings — every posting of a probed term survives pruning, so the
    * count equals the full-corpus document frequency exactly.
    *
    * @param queries `(query_id, terms: array<string>)`, as
    *                [[Retrieval.bm25TopK]]
    */
  def search(spark: SparkSession, path: String, queries: DataFrame, k: Int,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val m = readManifest(spark, path)
    val qTerms = queries.select(col("query_id"),
      explode(col("terms")).as("t"))
      .select(col("query_id"), lower(col("t")).as("term"))
    // bounded driver collect: the distinct query terms — the probed-cells
    // class; past the cap the literals drop and the equi-join prunes alone
    val terms = qTerms.select("term").distinct()
      .limit(MaxProbedTermLiterals + 1).collect().map(_.getString(0))
    val postings = readPostingsWith(spark, path, m)
    val pruned =
      if (terms.length <= MaxProbedTermLiterals) {
        val buckets = terms.map(termBucket(_, m.buckets)).distinct.sorted
        postings
          .filter(col("tb").isin(buckets.map(Integer.valueOf).toSeq: _*))
          .filter(col("term").isin(terms.toSeq: _*))
      } else postings
    val tfQ = pruned
      .join(broadcast(qTerms.select("term").distinct()), Seq("term"))
      .select("doc_id", "term", "tf", "dl")
    val stats = spark.createDataFrame(Seq((m.nDocs, m.sumDl)))
      .toDF("n_docs", "sum_dl")
    Retrieval.scoreAndRank(tfQ, qTerms, stats, k, k1, b)
  }
}
