package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Salted equi-join for skewed keys.
  *
  * A shuffle join on a key with heavy hitters sends every row of a hot
  * key to one reducer; AQE's skew-join split handles many cases at
  * runtime, but salting is the deterministic, planner-independent tool
  * when the skew is known (e.g. a null-ish sentinel key or a power-law
  * entity). The skewed (large) side gets a random-but-deterministic salt
  * in [0, buckets); the small side is replicated `buckets` times; the
  * join key becomes (key, salt), spreading each hot key over `buckets`
  * reducers. Row-multiplicity semantics are exactly those of the plain
  * inner join.
  */
object SkewJoin {

  /** Deterministic per-row salt in [0, buckets): hash of the whole row's
    * join key plus a uniquifier column (so identical keys still spread).
    * Uses xxhash64 — stable across runs, partitionings, and executors. */
  private def salt(uniquifier: Column, buckets: Int): Column =
    pmod(xxhash64(uniquifier), lit(buckets)).cast("int")

  /** Derive the salt bucket count from OBSERVED skew instead of a fixed
    * constant: one map-side-partial aggregation over the large side
    * (collecting a single driver row — the percentile-precheck pattern)
    * measures the hottest key's row count against the rows a balanced
    * reducer would take (total / spark.sql.shuffle.partitions). A key
    * 100× over budget gets ~100 buckets (capped at `maxBuckets`); a
    * near-balanced keyset derives 1 — salting disabled, no replication
    * cost. The measuring pass is one extra scan of the large side; at
    * scale, derive once per recurring pipeline and pin the result. */
  def deriveBuckets(large: DataFrame, largeKey: String,
                    maxBuckets: Int = 64): Int = {
    val row = large.groupBy(col(largeKey)).agg(count(lit(1)).as("__c"))
      .agg(max(col("__c")), sum(col("__c"))).head()
    if (row.isNullAt(0)) 1
    else {
      val hottest = row.getLong(0)
      val total = row.getLong(1)
      val parts = math.max(1,
        large.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
      val target = math.max(1L, total / parts)
      math.min(maxBuckets.toLong,
               math.max(1L, (hottest + target - 1) / target)).toInt
    }
  }

  /** Inner-join `large` (skewed) with `small` on `largeKey === smallKey`,
    * spreading each key over `buckets` reducers. `buckets <= 0` (the
    * default) derives the count from the observed hottest key via
    * [[deriveBuckets]].
    *
    * @param uniquifier a column on `large` that varies within a key group
    *                   (any id/payload column) — drives salt assignment
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame,
                      largeKey: String, smallKey: String,
                      uniquifier: String, buckets: Int = 0): DataFrame =
    saltedInnerJoin(large, small, largeKey, smallKey, col(uniquifier), buckets)

  /** Variant without a caller-named uniquifier: salts on the whole large
    * row (a struct of every column), which spreads hot keys as long as
    * their rows differ in *any* column — the right default when the
    * caller (e.g. the NL route) can't name a within-key-varying column. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame,
                      largeKey: String, smallKey: String,
                      buckets: Int): DataFrame =
    saltedInnerJoin(large, small, largeKey, smallKey,
                    struct(large.columns.toIndexedSeq.map(col): _*), buckets)

  def saltedInnerJoin(large: DataFrame, small: DataFrame,
                      largeKey: String, smallKey: String,
                      uniquifier: Column, buckets: Int): DataFrame = {
    val b = if (buckets > 0) buckets else deriveBuckets(large, largeKey)
    val saltedLarge = large.withColumn("__salt", salt(uniquifier, b))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(b - 1))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(largeKey) === replicatedSmall(smallKey) &&
        saltedLarge("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
