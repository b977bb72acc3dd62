package graft

import org.apache.spark.sql.DataFrame

import graft.plans.Plan

/** The pipeline state record — typed counterpart of the reference's
  * `TransformState` dict (agentic_workflow_transformation.py:15-21):
  * `{description, sample_data, plan, code, output_path, attempts}`.
  * The LLM stages' string artifacts become typed ones (plan IR instead of
  * a plan string; a compiled DataFrame instead of code text), and
  * `attempts` is dropped — compilation is deterministic, so the critic's
  * bounded repair loop (MAX_RETRIES=2, :159) has nothing to repair. */
final case class TransformState(
    description: String,
    input: DataFrame,
    plan: Option[Plan] = None,
    result: Option[DataFrame] = None,
    outputPath: Option[String] = None,
    valid: Option[Boolean] = None,
    validationErrors: Seq[String] = Nil)
