package graft.queries

import graft.SparkSpec

/** Global plan hygiene over EVERY driver query: no unpartitioned
  * cartesian products and a bounded shuffle count. This is the net that
  * catches a future query formulation silently degrading into a
  * single-reducer or all-pairs plan (as the constant-key embedding join
  * once did). */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose *intended* shape is a broadcast cross product
    * (brute-force scoring of a small query set against the corpus). */
  private val intendedCross = Set("x1_ann_bruteforce")

  test("no driver query plans a CartesianProduct") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${plan.take(800)}")
    }
  }

  /** Under the canonical (ReusedExchange-aware) count every declared
    * query plans ≤ 6 distinct shuffles. Exceptions must justify each
    * extra exchange the way the old minhash exception did
    * (candidate-sized, never corpus-sized):
    *  - x118/x119 evaluate ONE ranking against ANOTHER — two complete
    *    retrieval pipelines (the at-rest hybrid probe and the exact
    *    hybrid reference, each a lexical arm + a vector arm + the RRF
    *    fuse) plus the metric tail. The exchanges past the single-query
    *    bound are the evaluator's own: per-query hit/denominator
    *    aggregations and the final join, all over k-bounded frames
    *    (q×k rows) — candidate-sized by construction, never corpus. */
  /**  - the flat BM25F scans (x129/nl151 and the filtered x134) carry
    *    ONE extra exchange by construction: BM25F aggregates per
    *    (doc, term, FIELD) before the weighted per-(doc, term) fold —
    *    a real additional aggregation level versus single-field BM25.
    *    Both exchanges carry only query-term-MATCHING tokens (the
    *    broadcast query-term prune lands before either), so the extra
    *    one is candidate-sized, never corpus-sized. The at-rest twin
    *    (x130/x135/nl152) needs no such exception — the fielded index
    *    stores the per-(doc, term, field) rows, so the probe starts at
    *    the second level. */
  /**  - x141/x142 are x118/x119 on the FIELDED hybrid: the same two
    *    complete pipelines + evaluator tail, where the exact-reference
    *    lexical arm is the flat BM25F scan — which carries its own
    *    documented extra (doc, term, field) aggregation level (the
    *    x129 exception). 8 + 1, every extra exchange candidate-sized. */
  private val shuffleBoundExceptions: Map[String, Int] = Map(
    "x118_hybrid_recall" -> 8,
    "x119_hybrid_ndcg" -> 8,
    "x141_hybrid_recall_fielded" -> 9,
    "x142_hybrid_ndcg_fielded" -> 9,
    "x129_bm25f" -> 7,
    "x134_bm25f_filtered" -> 7,
    "x139_bm25f_full" -> 7,
    "nl151_bm25f" -> 7,
    // the flat fielded-PHRASE scans score through the same BM25F fold
    // (the x129 extra level); the within-field containment branch joins
    // a broadcast phrase frame — no exchange of its own
    "x143_bm25f_phrase" -> 7,
    "x145_bm25f_sloppy" -> 7,
    "x147_bm25f_phrase_filtered" -> 7,
    "nl156_bm25f_phrase" -> 7,
    "nl158_bm25f_sloppy" -> 7,
    "nl160_bm25f_full" -> 7)

  test("every query's shuffle count stays bounded") {
    val exchangeCounts = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      // Count CANONICALLY DISTINCT exchanges — the number that executes.
      // A DataFrame reused across join sides / union branches reprints
      // its whole subtree, so a raw occurrence count multiplies ONE
      // physical shuffle by the fan-out (the probe-side respread in the
      // minhash verify path prints 12×); Spark's ReusedExchange dedups
      // canonically-equal exchanges at runtime, which normalizing the
      // expr-ids/plan-ids out of the Exchange line approximates.
      val exchanges = "(?<!Broadcast)Exchange[^\n]*".r.findAllIn(plan)
        .map(_.replaceAll("#\\d+", "#?").replaceAll("plan_id=\\d+", "plan_id=?"))
        .toSet.size
      name -> exchanges
    }.sortBy(-_._2)
    info(exchangeCounts.take(5).map { case (n, c) => s"$n=$c" }.mkString(", "))
    exchangeCounts.foreach { case (name, c) =>
      val bound = shuffleBoundExceptions.getOrElse(name, 6)
      assert(c <= bound, s"$name plans $c shuffles (bound $bound) — investigate")
    }
  }

  test("new corpus operators keep their claimed plan shapes") {
    def plan(name: String) =
      graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
    // x27: one explode + ONE shuffle on the span key (partial+final agg),
    // plus the conditional spreadToCores round-robin ahead of the span
    // kernel (absent on already-wide scans); a countDistinct-style
    // expand would show a second hashpartitioning exchange
    val x27 = plan("x27_repeated_spans")
    assert("Exchange hashpartitioning".r.findAllIn(x27).length == 1,
      s"x27 should hash-shuffle exactly once (the span agg):\n${x27.take(800)}")
    assert("Exchange RoundRobinPartitioning".r.findAllIn(x27).length <= 1,
      s"x27 should carry at most the spread exchange:\n${x27.take(800)}")
    assert(!x27.contains("Expand"), "x27 must not plan a distinct-expand")
    // x29: per-group top-k via the aggregator — no Window exec
    val x29 = plan("x29_top_tokens")
    assert(!x29.contains("Window"),
      s"x29 should use the partial top-k aggregator, not a window rank:\n${x29.take(800)}")
    // x28: sliding windows Expand map-side, still a single agg shuffle
    val x28 = plan("x28_event_sliding")
    assert("(?<!Broadcast)Exchange".r.findAllIn(x28).length <= 1,
      s"x28 should aggregate with one shuffle:\n${x28.take(800)}")
    // x68: shard/position assignment is pure map-side — zero exchanges
    val x68 = plan("x68_shuffle_shards")
    assert(!x68.contains("Exchange"),
      s"x68 shuffle assignment must not shuffle:\n${x68.take(800)}")
    // x69: the change feed's per-day key anti-joins broadcast the old
    // day's keys — no shuffle exchange anywhere in the delta plan
    val x69 = plan("x69_manifest_changes")
    assert("(?<!Broadcast)Exchange".r.findAllIn(x69).isEmpty,
      s"x69 delta should anti-join via broadcast, not shuffle:\n${x69.take(800)}")
  }

  test("broadcast joins stay broadcast at the dim tables") {
    Seq("q3_join_revenue", "q6_multi_join_revenue").foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$name lost its broadcast join")
    }
    intendedCross.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
        s"$name should score via a broadcast, got:\n${plan.take(800)}")
    }
  }
}
