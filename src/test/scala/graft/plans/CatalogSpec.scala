package graft.plans

import graft.SparkSpec
import graft.Engine
import graft.operators.{Dedup, Events}
import org.apache.spark.sql.functions._

/** The table catalog: two-table operators reached from natural language.
  * The reference's state binds exactly ONE frame
  * (agentic_workflow_transformation.py:17); the catalog closes that
  * capability wall for decontaminate / as-of / salted-join descriptions. */
class CatalogSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("grammar: decontaminate, as-of, and salted-join clauses parse") {
    assert(NLParser.parse("Drop documents that share 8-token spans with benchmark.")
      == Plan(List(Op.Decontaminate(8, "benchmark"))))
    assert(NLParser.parse("Drop documents sharing 10 token spans with the evalset.")
      == Plan(List(Op.Decontaminate(10, "evalset"))))
    assert(NLParser.parse("Join events to signups as of time.")
      == Plan(List(Op.AsOfJoin("signups"))))
    assert(NLParser.parse("Join orders to customers on o_custkey = c_custkey salted 8 ways.")
      == Plan(List(Op.SaltedJoin("customers", "o_custkey", "c_custkey", 8))))
    // plain "drop" still drops columns — "span(s)" is the discriminator
    assert(NLParser.parse("Drop city column.") == Plan(List(Op.Drop(Seq("city")))))
    // continuous-score sibling of decontaminate
    assert(NLParser.parse("Score contamination against benchmark with 8 token spans.")
      == Plan(List(Op.ContaminationScore(8, "benchmark"))))
    assert(NLParser.parse("Score contamination vs the evalset using 10 word spans.")
      == Plan(List(Op.ContaminationScore(10, "evalset"))))
    // "score quality" must not misroute through the contamination arm
    assert(NLParser.parse("Score quality.") == Plan(List(Op.ScoreQuality)))
    // bloom-pruned semi-join clause; "keep top"/"keep the latest" unaffected
    assert(NLParser.parse(
      "Keep rows matching urgent on l_orderkey = o_orderkey with a bloom filter.")
      == Plan(List(Op.BloomSemiJoin("urgent", "l_orderkey", "o_orderkey"))))
    assert(NLParser.parse("Keep top 3 rows.") == Plan(List(Op.Limit(3))))
    // incremental ingest dedup — "already" is the discriminator; plain
    // column drop and span decontamination stay untouched
    assert(NLParser.parse("Drop documents already in corpus.")
      == Plan(List(Op.DedupAgainst("corpus"))))
    assert(NLParser.parse("Drop documents that are already in the ingested.")
      == Plan(List(Op.DedupAgainst("ingested"))))
    // near-dup ingest dedup — the hyphenated participle discriminates;
    // both wordings and the bare "at 0.5" threshold connector parse
    assert(NLParser.parse(
      "Drop documents near-duplicated in corpus by minhash jaccard 0.5.")
      == Plan(List(Op.DedupNearAgainst("corpus", 0.5))))
    assert(NLParser.parse(
      "Drop docs that are near-duplicating the history at 0.7.")
      == Plan(List(Op.DedupNearAgainst("history", 0.7))))
  }

  test("NL bloom semi-join route equals the direct operator (x48)") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val viaNl = Engine.run(
        "Keep rows matching urgent on l_orderkey = o_orderkey with a bloom " +
        "filter and select columns l_orderkey and l_linenumber.",
        li, Map("urgent" -> urgent))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val direct = li.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaNl == direct && viaNl.nonEmpty)
  }

  test("NL contamination score route equals the direct operator (x47)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = docs.filter(col("source") === "src19")
    val viaNl = Engine.run(
        "Score contamination against benchmark with 8 token spans.",
        docs, Map("benchmark" -> bench))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val direct = Dedup.contaminationScore(docs, bench, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaNl == direct && viaNl.nonEmpty)
    assert(viaNl.exists(_._4 > 0.0), "benchmark docs must self-score > 0")
  }

  test("an unbound table name fails with the typed plan error, listing bindings") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val e = intercept[InvalidPlanException] {
      Engine.run("Drop documents that share 8-token spans with benchmark.",
                 docs, Map("other" -> docs)).count()
    }
    assert(e.getMessage.contains("benchmark") && e.getMessage.contains("other"))
  }

  test("asOfJoin: inclusive at-equal-ts, null before first right row, passthrough") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // before any signup -> null
      (2L, 10L, 200L), // exactly at the signup ts -> sees it
      (3L, 10L, 250L), // after -> still 200
      (4L, 20L, 500L)  // other user, no signups at all -> null
    ).toDF("event_id", "user_id", "ts_us")
    val right = Seq((10L, 200L), (10L, 300L)).toDF("user_id", "ts_us")
    val out = Events.asOfJoin(left, right).orderBy("event_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(0).isNullAt(3) && out(3).isNullAt(3))
    assert(out(1).getLong(3) == 200L && out(2).getLong(3) == 200L)
    // every left column survives, in order, plus the out column
    assert(out.head.schema.fieldNames.toSeq ==
      Seq("event_id", "user_id", "ts_us", "last_signup_us"))
  }

  test("two-table as-of join equals the single-frame window formulation (x21)") {
    val ev = Events.load(spark, sfDir)
    val viaCatalog = Events.asOfJoin(
        ev, ev.filter(col("event_type") === "signup"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("last_signup_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val viaWindow = graft.queries.EventQueries
      .queries("x21_event_asof_signup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                           if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(viaCatalog == viaWindow)
  }

  test("NL decontaminate route equals the direct operator (x30)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = docs.filter(col("source") === "src19")
    val viaNl = Engine.run(
        "Drop documents that share 8-token spans with benchmark " +
        "and select columns doc_id and source.",
        docs, Map("benchmark" -> bench))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val direct = Dedup.decontaminate(docs, bench, n = 8)
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaNl == direct && viaNl.nonEmpty)
    assert(!viaNl.exists(_._2 == "src19"), "benchmark docs must drop themselves")
  }

  test("NL salted join keeps plain-inner-join multiplicity") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val viaNl = Engine.run(
        "Join orders to customers on o_custkey = c_custkey salted 8 ways " +
        "and group by c_mktsegment and count c_custkey.",
        orders, Map("customers" -> cust))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = orders.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(col("c_custkey")).as("count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaNl == plain && viaNl.nonEmpty)
  }
}
