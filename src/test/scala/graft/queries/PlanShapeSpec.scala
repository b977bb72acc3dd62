package graft.queries

import graft.SparkSpec

/** Physical-plan shape assertions — the "would this survive 100×
  * scale-up" checks. Not row-level correctness (the DuckDB oracle gate
  * covers that) but the plan properties that matter on a cluster:
  * filters reaching the parquet scan, dims broadcast instead of
  * shuffled, top-k planned as TakeOrderedAndProject, whole-stage
  * codegen covering the hot path. */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntryPlans.formatted(spark, sf, name)

  test("q5 filter predicates are pushed to the parquet scan") {
    val p = plan("q5_filter_pushdown")
    assert(p.contains("PushedFilters:"), p.take(2000))
    assert(p.contains("In(l_returnflag"), "returnflag IN should be pushed")
    assert(p.contains("LessThan(l_quantity"), "quantity < should be pushed")
  }

  test("q5 scan reads only the projected columns") {
    val p = plan("q5_filter_pushdown")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(!readSchema.contains("l_extendedprice"),
      s"projection not pruned: $readSchema")
  }

  test("q3 joins the customer dim via broadcast, not shuffle") {
    val p = plan("q3_join_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q6 multi-join broadcasts all three dims") {
    val p = plan("q6_multi_join_revenue")
    val n = "BroadcastHashJoin".r.findAllIn(p).length
    assert(n >= 3, s"expected >=3 broadcast joins, got $n")
  }

  test("nl78 keeps the fact-fact join planner-decided while dims broadcast") {
    // the NL twin of q6: the lineitem⋈orders join carries NO spoken
    // broadcast hint, so the plan must not force-broadcast a fact side;
    // the three dimension joins carry the hint and must broadcast. At
    // fixture scale the planner may still auto-broadcast the small fact
    // side, so the assertion is on the LOGICAL hints, not the runtime
    // pick: exactly three ResolvedHint/broadcast markers.
    val df = graft.SparkEntry.queries("nl78_multi_join_revenue")(spark, sf)
    val optimized = df.queryExecution.analyzed.toString
    val hints = "UnresolvedHint|ResolvedHint".r.findAllIn(optimized).length
    assert(hints == 3, s"expected exactly 3 broadcast hints (dims only):\n" +
      optimized.take(2000))
    assert(df.count() > 0)
  }

  test("q2 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q2_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q1 aggregation is two-phase hash aggregate (partial + final)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(p.contains("partial_sum"), "map-side partial aggregation expected")
    // exactly one shuffle: the partial->final exchange on the group keys
    val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 1, s"expected a single shuffle, got $exchanges")
  }

  test("nl/x twin queries produce canonically identical plans") {
    // The twins are the same operator call reached through two surfaces
    // (NL route vs direct query registration), so their OPTIMIZED plans
    // must be indistinguishable — `sameResult` compares canonicalized
    // plans (expression IDs normalized). This is the structural half of
    // the bench-credibility argument: any twin timing divergence in a
    // BENCH run is then box noise by elimination, never a plan
    // difference. (Bench additionally interleaves twin reps so the noise
    // cancels within a pair.)
    val twins = Seq(
      "nl3_dedup_minhash"       -> "x5_dedup_minhash",
      "nl4_dedup_simhash"       -> "x6_dedup_simhash",
      "nl33_dedup_embedding_lsh" -> "x33_embedding_pairs_lsh",
      "nl37_chunk_documents"    -> "x38_chunk_documents",
      "nl80_calibrate_lsh"      -> "x60_lsh_calibration",
      "nl81_calibrate_ivf"      -> "x61_ivf_calibration",
      "nl118_project_embeddings" -> "x87_random_projection")
    twins.foreach { case (nl, x) =>
      val a = graft.SparkEntry.queries(nl)(spark, sf).queryExecution.optimizedPlan
      val b = graft.SparkEntry.queries(x)(spark, sf).queryExecution.optimizedPlan
      assert(a.sameResult(b),
        s"$nl and $x should plan identically:\n--- $nl ---\n$a\n--- $x ---\n$b")
    }
  }

  test("x39 executes the shared tf lineage once (runtime exchange reuse)") {
    // TF-IDF fans the (doc, token) counts out to three consumers (the
    // df aggregation, the N distinct-docs aggregation, and the score
    // join); the plan is only right if the expensive scan+explode+agg
    // lineage runs ONCE and the other branches consume ReusedExchange.
    // AQE applies the reuse at runtime, so assert on the plan that
    // actually executed (collect() runs the dataset's own
    // QueryExecution; count() would plan a fresh one and show
    // isFinalPlan=false with phantom duplicate scans).
    val df = graft.SparkEntry.queries("x39_tfidf_keywords")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), "not the executed AQE plan")
    assert("ReusedExchange".r.findAllIn(p).length >= 2,
      s"tf lineage recomputed per branch:\n${p.take(3000)}")
  }

  test("q1 executes inside whole-stage codegen") {
    val df = graft.SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect()
    // '*' prefixes mark WholeStageCodegen stages in the executed plan
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("*(1)"), executed.take(2000))
  }
}

/** Helper giving specs access to a query's formatted physical plan. */
object SparkEntryPlans {
  def formatted(spark: org.apache.spark.sql.SparkSession, sfDir: String,
                name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }
}
