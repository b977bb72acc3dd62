package graft.operators

import org.apache.spark.sql.functions._

/** Dev-only timing probe for the exact-rerank regimes at a serving
  * batch shape: `sbt "Test/runMain graft.operators.RerankProbe <sfDir>
  * <nQueries> <rerank>"`. Times sq8TopK (candidate pass + shared
  * rescore tail) with the collect cap forced to each regime, and
  * asserts the two results identical — the SCALE_NOTES evidence for
  * the large-batch path. */
object RerankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/testdata/sf1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(1000)
    val rerank = args.lift(2).map(_.toInt).getOrElse(150)
    val spark = graft.Sessions.local("32", "graft-rerank-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = embs.filter(col("vec_id") < nQueries)
    def run(tag: String, maxCollect: Int): Set[(Long, Long, Long)] = {
      // warm + 2 timed reps; the regime is forced through the cap
      var out: Set[(Long, Long, Long)] = Set.empty
      for (r <- 0 to 2) {
        val t0 = System.nanoTime()
        val cand = Similarity.bruteForceTopK(
          sq8Q(queries), sq8Q(embs), rerank)
          .select(col("query_id"), col("neighbor_id"))
        val res = Similarity.exactRerank(queries, embs, cand, 5,
          "vec_id", "embedding", maxCollect = maxCollect)
        out = res.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
        val t = (System.nanoTime() - t0) / 1e9
        if (r > 0) println(f"RERANK $tag rep$r $t%.2f s (${out.size} rows)")
      }
      out
    }
    def sq8Q(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"),
        graft.functions.SketchFunctions.sq8Encode(col("embedding")).as("embedding"))
    val small = run("literal-in", Int.MaxValue)
    val big = run("distributed", 1)
    println(s"RERANK identical=${small == big} pairs=${nQueries}x$rerank")
    spark.stop()
  }
}
