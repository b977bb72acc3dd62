package graft

import graft.sources.Sources

/** Full Engine.invoke lifecycle: plan → compile → execute → validate,
  * mirroring the reference's app.invoke state machine. */
class LifecycleSpec extends SparkSpec {

  private lazy val sample = Sources.canonicalSample(spark)

  test("invoke on the default description yields a valid state") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-run").toString
    val out = Engine.invoke(
      TransformState(Run.DefaultDescription, sample), Some(tmp))
    assert(out.plan.isDefined && out.result.isDefined)
    assert(out.valid.contains(true), out.validationErrors.mkString("; "))
    assert(out.outputPath.exists(_.contains("transform_Filter_rows_where_age_30")))
    assert(out.result.get.count() == 7)
    val file = java.nio.file.Paths.get(out.outputPath.get)
    assert(java.nio.file.Files.exists(file))
    assert(java.nio.file.Files.readString(file).startsWith("name,age"))
  }

  test("invoke without outDir skips the sink but still validates") {
    val out = Engine.invoke(TransformState("Drop city column.", sample))
    assert(out.outputPath.isEmpty)
    assert(out.valid.contains(true))
    assert(out.result.get.columns.toSeq == Seq("name", "age"))
  }

  test("validator catches a limit violation on a hand-built bad result") {
    val p = plans.Plan(List(plans.Op.Limit(2)))
    val report = Validator.validate(p, sample, sample) // "result" ignores the limit
    assert(!report.valid)
    assert(report.errors.exists(_.contains("limit")))
  }

  test("validator passes every eval-corpus plan end-to-end") {
    operators.EvalHarness.descriptions.foreach { d =>
      val out = Engine.invoke(TransformState(d, sample))
      assert(out.valid.contains(true), s"'$d': ${out.validationErrors.mkString("; ")}")
    }
  }
}
