package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Sources

/** The reference's `--eval` harness (agentic_workflow_transformation.py:
  * 333-397) made deterministic: run each of the 20 NL descriptions through
  * parse → compile → execute, write each result CSV with the reference's
  * slug naming, and emit the summary table with the reference's schema
  * `(id, description, actual_rows, pass, output_path)`
  * (agentic_workflow_transformation.py:385-391).
  *
  * `pass` = parsed + compiled + executed + [[graft.Validator]] structural
  * invariants hold (the critic's deterministic replacement); exact-result
  * validation lives in the DuckDB oracle gate and the ScalaTest suite
  * (SURVEY.md §5.2).
  */
object EvalHarness {

  /** All 20 eval descriptions, verbatim from
    * agentic_workflow_transformation.py:339-362. */
  val descriptions: Seq[String] = Seq(
    "Filter rows where age > 30 and select columns name and age.",
    "Filter rows where city == 'New York' and select name, city.",
    "Filter rows where age <= 30 and select name and age.",
    "Sort by age descending and keep top 3 rows.",
    "Group by city and count names.",
    "Add is_adult column where is_adult = age >= 18.",
    "Select rows where name starts with 'J' and select name, city.",
    "Rename name to full_name.",
    "Drop city column.",
    "Filter rows where age > 100",
    "Filter rows where age > 30 AND city == 'New York' and select name, age, city.",
    "Filter rows where age > 30 OR city == 'New York' and select name, age.",
    "Filter rows where age between 30 and 45 and name starts with 'J'.",
    "Select rows where (age > 30 AND city == 'Chicago') OR (age <= 25 AND city == 'New York').",
    "Select rows where name starts with 'J' and age <= 35.",
    "Filter rows where age > 30 and city in ('Chicago', 'Boston').",
    "Filter rows where age > 30 and not city == 'Los Angeles'.",
    "Sort by age desc and then filter age > 30 and keep top 2.",
    "Group by city and show average age where average_age > 30.",
    "Filter where name contains 'an' and age between 30 and 50.")

  /** The default single-shot description (agentic_workflow_transformation.py:318). */
  val defaultDescription: String =
    "Filter rows where age > 30 and select columns name and age."

  final case class EvalResult(id: Int, description: String, actual_rows: Long,
                              pass: Boolean, output_path: String)

  /** Run the corpus against `input`; optionally export each result CSV to
    * `outDir` with the reference's `transform_{slug}_{ts}.csv` naming. */
  def run(spark: SparkSession, input: DataFrame,
          outDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val results = descriptions.zipWithIndex.map { case (desc, i) =>
      try {
        val state = graft.Engine.invoke(
          graft.TransformState(desc, input), outDir)
        val rows = state.result.get.count()
        EvalResult(i + 1, desc, rows, pass = state.valid.contains(true),
                   state.outputPath.getOrElse(""))
      } catch {
        case e: Exception =>
          EvalResult(i + 1, desc, -1L, pass = false, s"ERROR: ${e.getMessage}")
      }
    }
    results.toDF()
  }

  /** Convenience: run against the canonical 10-row fixture. */
  def runCanonical(spark: SparkSession): DataFrame =
    run(spark, Sources.canonicalSample(spark))
}
