package graft


import graft.operators.EvalHarness
import graft.sources.{Sinks, Sources}

/** CLI eval entry point — the engine's equivalent of the reference's
  * `python agentic_workflow_transformation.py --eval`
  * (agentic_workflow_transformation.py:333-397): run the 20-description
  * corpus end-to-end, export each result CSV with the reference's
  * `transform_{slug}_{UTCts}.csv` naming, and write `eval_results.csv`
  * with the reference's summary schema.
  *
  * Usage: runMain graft.Eval [inputCsv] [outDir]
  *   inputCsv — optional CSV with header (defaults to the canonical
  *              10-row sample, input.csv:1-11)
  *   outDir   — output directory (default ./eval_out)
  */
object Eval {
  def main(args: Array[String]): Unit = {
    val inputCsv = args.lift(0).filter(_.nonEmpty)
    val outDir = args.lift(1).getOrElse("eval_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-eval")
    spark.sparkContext.setLogLevel("WARN")

    val input = inputCsv match {
      case Some(path) => Sources.csv(spark, path)
      case None       => Sources.canonicalSample(spark)
    }
    val results = EvalHarness.run(spark, input, outDir = Some(outDir))
    Sinks.csvSingleFile(results, outDir, "eval_results.csv")
    results.orderBy("id").show(25, truncate = 60)
    spark.stop()
  }
}
