package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Sources

/** Single-shot CLI — the reference's default entry point
  * (`python agentic_workflow_transformation.py`,
  * agentic_workflow_transformation.py:317-330, 398-400): run ONE
  * transformation description against a CSV (or the canonical inline
  * sample), write the result CSV, report validity.
  *
  * Usage: runMain graft.Run [description] [inputCsv] [outDir]
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
