package graft.operators

import org.apache.spark.sql.functions._

/** Dev-only measurement main for the BM25 document-frequency stage
  * under TERM SKEW — the inverted index's classic hot key: a stop-word
  * query term whose df ≈ the corpus.
  *
  * Compares the two df formulations over the same aggregated matching
  * set (tfQ):
  *  - WINDOW: `count(*) over (partition by term)` — the pre-round-18
  *    form; the hot term's rows sort+stream through ONE task;
  *  - MERGEABLE: `groupBy(term).count` + broadcast join back — the
  *    shipped form (Retrieval.scoreAndRank); map-side partials, the
  *    df frame is query-term-bounded.
  *
  * Usage: `sbt "runMain graft.operators.DfSkewProbe [nDocs] [reps]"`
  * (defaults 500000, 3). Numbers land in SCALE_NOTES.md §bench.
  */
object DfSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500000)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-df-skew-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // every document contains the stop word; tails vary so the matching
    // set is wide but the hot term dominates: df("the") = n. The corpus
    // is written to parquet and re-read so the measured pipeline is the
    // real serving shape (scan + tokenize + shuffle — where exchange
    // reuse amortizes the df branch), not a free in-memory range.
    val corpusPath = s"target/testdata/skew-$n/documents.parquet"
    if (!new java.io.File(corpusPath).exists()) {
      spark.range(n.toLong).select(col("id").as("doc_id"),
        concat_ws(" ", lit("the"),
          concat(lit("w"), pmod(col("id"), lit(997))),
          concat(lit("x"), pmod(col("id"), lit(7))),
          concat(lit("pad"), pmod(col("id"), lit(10007))),
          concat(lit("tail"), pmod(col("id"), lit(31))))
          .as("text"))
        .write.mode("overwrite").parquet(corpusPath)
    }
    val docs = spark.read.parquet(corpusPath)
    val queries = Seq((0L, Seq("the", "w3", "x2"))).toDF("query_id", "terms")
    val qTerms = queries.select(col("query_id"),
      explode(col("terms")).as("term"))
    val exploded = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"),
      explode(split(col("text"), " ")).as("term"))
    def tfQ = exploded
      .join(broadcast(qTerms.select("term").distinct()), Seq("term"))
      .groupBy("doc_id", "term")
      .agg(count("*").as("tf"), max("dl").as("dl"))

    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val df = mk
        val c = df.count()
        println(f"$tag rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
        if (r == reps && sys.env.contains("SPARK_GRAFT_PROBE_EXPLAIN")) {
          val plan = df.queryExecution.executedPlan.toString
          println(s"$tag reused-exchanges: " +
            plan.linesIterator.count(_.contains("ReusedExchange")))
          println(plan.linesIterator.take(60).mkString("\n"))
        }
      }
    }
    time("window   df") {
      tfQ.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("term")))
    }
    time("mergeable df") {
      tfQ.join(broadcast(tfQ.groupBy("term").agg(count(lit(1)).as("df"))),
        Seq("term"))
    }
    spark.stop()
  }
}
