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

  test("deriveBuckets scales with observed skew, 1 when balanced, capped") {
    // hot key = 90% of 2000 rows: the derived count is hottest-key rows
    // over the balanced-reducer budget (total / shuffle partitions), so
    // the expectation is computed from the session config — at 32
    // partitions (the bench session) this same fixture derives 29
    val skewed = (1 to 2000)
      .map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong))
      .toDF("k", "payload")
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val hottest = skewed.filter(col("k") === 42L).count()
    val target = math.max(1L, 2000L / parts)
    val expected = math.min(64L, (hottest + target - 1) / target)
    val dSkew = SkewJoin.deriveBuckets(skewed, "k")
    assert(dSkew.toLong == expected && dSkew > 1,
      s"90%-hot key at $parts partitions should derive $expected buckets: $dSkew")

    // derived count never exceeds the cap (a single all-hot key derives
    // the partition count — the most any spread can use — unless capped
    // lower)
    val extreme = (1 to 2000).map(i => (42L, i.toLong)).toDF("k", "payload")
    assert(SkewJoin.deriveBuckets(extreme, "k") == parts)
    assert(SkewJoin.deriveBuckets(extreme, "k", maxBuckets = 2) == 2)

    // near-balanced keys derive 1 — salting disabled, no replication
    val balanced = (1 to 2000).map(i => (i.toLong % 64, i.toLong)).toDF("k", "payload")
    assert(SkewJoin.deriveBuckets(balanced, "k") == 1)

    // empty frame: no hottest key, no salting
    assert(SkewJoin.deriveBuckets(skewed.filter(col("k") < -1), "k") == 1)
  }

  test("derived salting shrinks per-reducer row variance on a hot key") {
    val fact = (1 to 2000)
      .map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong))
      .toDF("k", "payload")
    val b = SkewJoin.deriveBuckets(fact, "k")
    def variance(xs: Array[Long]): Double = {
      val m = xs.map(_.toDouble).sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    // reducer load proxy: rows per distinct join key (unsalted) vs rows
    // per (key, salt) (salted) — the groups a hash shuffle would send to
    // single reducers in each formulation
    val unsalted = fact.groupBy("k").count().collect().map(_.getLong(1))
    val salted = fact
      .withColumn("salt", pmod(xxhash64(col("payload")), lit(b)))
      .groupBy("k", "salt").count().collect().map(_.getLong(1))
    assert(salted.max < unsalted.max / 2,
      s"hot-key max group must shrink: ${unsalted.max} -> ${salted.max} ($b buckets)")
    assert(variance(salted) < variance(unsalted) / 2,
      s"per-reducer variance must shrink: ${variance(unsalted)} -> ${variance(salted)}")

    // and the derived-bucket join still returns exact inner-join semantics
    val dim = (0L to 50L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val plain = fact.join(dim, fact("k") === dim("dk")).select("k", "payload", "name")
    val auto = SkewJoin.saltedInnerJoin(fact, dim, "k", "dk", "payload")
      .select("k", "payload", "name")
    assert(plain.count() == auto.count())
    val p = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val s = auto.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(p == s)
  }
}
