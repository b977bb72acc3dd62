package graft

import org.apache.spark.sql.DataFrame

import graft.plans.{Compiler, Op, Plan}

/** Deterministic validator — the critic_agent's replacement
  * (agentic_workflow_transformation.py:157-255). The reference asks an
  * LLM YES/NO and accepts everything offline (:175-177); here the checks
  * are structural invariants derived from the plan itself, including the
  * inverted-operator guards AGENTIC_WORKFLOW.md:99 recommends. Full
  * value-level validation is the DuckDB oracle gate (Verify) and the
  * spec suites — this layer is the cheap per-run sanity net. */
object Validator {

  final case class Report(valid: Boolean, errors: Seq[String])

  def validate(plan: Plan, input: DataFrame, result: DataFrame): Report = {
    val errors = Seq.newBuilder[String]

    val inCols = input.columns.toSeq
    val outCols = result.columns.toSeq
    if (outCols.isEmpty) errors += "result has no columns"

    // row-count invariants derivable without running the plan twice.
    // SERVING OPT-OUT: a TableOp-led plan (index probe, maintenance,
    // time travel) REPLACES the input with a table read, so comparing
    // counts against the original input frame is meaningless — and on
    // the hot serving path the two count() actions would be an extra
    // pass over the table per spoken probe. Structural checks
    // (projection/rename/drop) still run; count-based ones are skipped
    // entirely, so validate() of a probe plan triggers ZERO Spark jobs
    // (spec-pinned in ValidatorSpec).
    val serving = plan.ops.exists(_.isInstanceOf[Op.TableOp])
    val rowChanging = serving || plan.ops.exists {
      case _: Op.GroupAgg | _: Op.Limit | _: Op.Filter | _: Op.Having => true
      case _: Op.CorpusOp => true // derived tables (pairs/stats/clusters)
      case _: Op.RelationalExtOp => true // grouping sets/reshape/joins/set ops
      case _ => false
    }
    lazy val inCount = input.count()
    lazy val outCount = result.count()
    if (!rowChanging && outCount != inCount)
      errors += s"row-preserving plan changed count: $inCount -> $outCount"
    plan.ops.foreach {
      case Op.Limit(k) if !serving && outCount > k =>
        errors += s"limit($k) produced $outCount rows"
      case Op.Filter(_) | Op.Having(_) if !serving && outCount > inCount =>
        errors += s"filter grew the row count: $inCount -> $outCount"
      case Op.Select(cols) =>
        // order-exact projection (AGENTIC_WORKFLOW.md:108): expected
        // names come from the compiler's OWN resolution (the
        // singular/plural tolerance lives in exactly one place —
        // Compiler.resolve), so this check is exact against what the
        // compiler actually projected, not a re-guessed heuristic that
        // could drift and mask a genuine mismatch.
        val expected = cols.map(c => Compiler.resolve(input, c))
        if (plan.ops.lastIndexOf(Op.Select(cols)) == plan.ops.length - 1 &&
            outCols != expected)
          errors += s"projection mismatch: $outCols != $expected"
      case Op.Rename(from, to) =>
        if (outCols.contains(from) && !plan.ops.exists {
              case Op.DeriveBool(`from`, _) => true; case _ => false })
          errors += s"renamed column '$from' still present"
        if (!outCols.contains(to) && !plan.ops.exists {
              case Op.Drop(cols) => cols.contains(to); case _ => false })
          errors += s"rename target '$to' missing"
      case Op.Drop(cols) =>
        cols.filter(outCols.contains).foreach(c => errors += s"dropped column '$c' still present")
      case _ => ()
    }

    val errs = errors.result()
    Report(errs.isEmpty, errs)
  }
}
