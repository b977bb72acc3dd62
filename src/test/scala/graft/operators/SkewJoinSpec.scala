package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  import spark.implicits._

  test("salted join returns exactly the plain inner-join result on skewed data") {
    // 90% of fact rows share one hot key
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong))
      .toDF("k", "payload")
    val dim = (0L to 50L).map(k => (k, s"dim_$k")).toDF("dk", "name")

    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select("k", "payload", "name")
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "k", "dk", "payload", buckets = 8)
      .select("k", "payload", "name")

    val p = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val s = salted.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(p == s, "salted join must preserve inner-join multiset semantics")
    assert(plain.count() == salted.count())
  }

  test("salt spreads the hot key across buckets") {
    val fact = (1 to 1000).map(i => (42L, i.toLong)).toDF("k", "payload")
    val dim = Seq((42L, "hot")).toDF("dk", "name")
    val perSalt = SkewJoin.saltedInnerJoin(fact, dim, "k", "dk", "payload", buckets = 8)
      .groupBy(pmod(xxhash64(col("payload")), lit(8))).count()
      .collect().map(_.getLong(1))
    assert(perSalt.length == 8, "all 8 salt buckets should receive rows")
    assert(perSalt.max < 1000, "no single bucket should hold the whole hot key")
  }
}
