package graft

import org.apache.spark.sql.DataFrame

import graft.plans.{Compiler, NLParser, Plan}

/** The engine facade — the deterministic equivalent of the reference's
  * linear agent pipeline `planner → codegen → executor → critic`
  * (agentic_workflow_transformation.py:259-267). The nondeterministic LLM
  * stages collapse into parse + compile; execution is lazy (Catalyst plans
  * it); validation is the oracle-equivalence harness (Verify + specs)
  * rather than an LLM judge.
  */
object Engine {

  /** description → typed plan IR (replaces planner_agent + code_generator_agent). */
  def plan(description: String): Plan = NLParser.parse(description)

  /** description + input → transformed DataFrame (lazy; no action run).
    * `catalog` binds the named tables two-table descriptions reference
    * ("… with benchmark", "join … to signups …") — the reference's state
    * holds one frame (agentic_workflow_transformation.py:17), so the
    * catalog is the capability step beyond its `exec()` surface. */
  def run(description: String, input: DataFrame,
          catalog: Map[String, DataFrame] = Map.empty,
          tablePath: Option[String] = None,
          vectorIndexPath: Option[String] = None): DataFrame =
    Compiler.compile(plan(description), input, catalog, tablePath,
                     vectorIndexPath)

  /** Full lifecycle on a [[TransformState]] — the deterministic
    * `app.invoke(state)` (agentic_workflow_transformation.py:259-267):
    * plan → compile → (optionally) execute to CSV → validate.
    * `tablePath` binds the manifested table the input was resolved from
    * (maintenance / time-travel verbs act on it). */
  def invoke(state: TransformState, outDir: Option[String] = None,
             catalog: Map[String, DataFrame] = Map.empty,
             tablePath: Option[String] = None,
             vectorIndexPath: Option[String] = None): TransformState = {
    val p = plan(state.description)
    val result = Compiler.compile(p, state.input, catalog, tablePath,
                                  vectorIndexPath)
    val path = outDir.map { dir =>
      graft.sources.Sinks.csvSingleFile(
        result, dir, graft.sources.Sinks.timestampedName(state.description)).toString
    }
    val report = Validator.validate(p, state.input, result)
    state.copy(plan = Some(p), result = Some(result), outputPath = path,
               valid = Some(report.valid), validationErrors = report.errors)
  }
}
