package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Sources

/** Single-shot CLI — the reference's default entry point
  * (`python agentic_workflow_transformation.py`,
  * agentic_workflow_transformation.py:317-330, 398-400): run ONE
  * transformation description against an input table (or the canonical
  * inline sample), write the result CSV, report validity.
  *
  * Input format dispatches on extension: `.parquet` (including the
  * driver's nanosecond-timestamped events table, whose `ts` is derived
  * µs-exactly as in [[graft.operators.Events.load]]), `.json`/`.jsonl`,
  * anything else CSV — so the full NL surface (dedup, sampling,
  * sessionize, multimodal, spans) is drivable from this entry point
  * against the corpus tables, not just the 10-row CSV.
  *
  * Usage: runMain graft.Run [description] [input] [outDir]
  */
object Run {
  /** The reference's default description (agentic_workflow_transformation.py:318). */
  val DefaultDescription = "Filter rows where age > 30 and select columns name and age."

  def main(args: Array[String]): Unit = {
    val description = args.lift(0).filter(_.nonEmpty).getOrElse(DefaultDescription)
    val inputCsv = args.lift(1).filter(_.nonEmpty)
    val outDir = args.lift(2).getOrElse("run_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-run")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val input = inputCsv match {
      case Some(path) if path.endsWith(".parquet") =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = Sources.parquet(spark, path)
        val tsIsRawNanos = df.schema.fields.exists(f =>
          f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        if (tsIsRawNanos)
          df.withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
            .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.col("ts_us")))
        else df
      case Some(path) if path.endsWith(".json") || path.endsWith(".jsonl") =>
        Sources.jsonLines(spark, path)
      case Some(path) => Sources.csv(spark, path)
      case None       => Sources.canonicalSample(spark)
    }
    val finalState = Engine.invoke(
      TransformState(description, input), outDir = Some(outDir))
    println(s"description : $description")
    println(s"plan        : ${finalState.plan.get.ops.mkString(" -> ")}")
    println(s"output      : ${finalState.outputPath.get}")
    println(s"valid       : ${finalState.valid.get}" +
      (if (finalState.validationErrors.nonEmpty)
         finalState.validationErrors.mkString(" [", "; ", "]") else ""))
    finalState.result.get.show(20, truncate = false)
    spark.stop()
  }
}
