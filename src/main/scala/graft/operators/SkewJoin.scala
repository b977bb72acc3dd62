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

  /** Inner-join `large` (skewed) with `small` on `largeKey === smallKey`,
    * spreading each key over `buckets` reducers.
    *
    * @param uniquifier a column on `large` that varies within a key group
    *                   (any id/payload column) — drives salt assignment
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame,
                      largeKey: String, smallKey: String,
                      uniquifier: String, buckets: Int = 8): DataFrame =
    saltedInnerJoin(large, small, largeKey, smallKey, col(uniquifier), buckets)

  /** Variant without a caller-named uniquifier: salts on the whole large
    * row (a struct of every column), which spreads hot keys as long as
    * their rows differ in *any* column — the right default when the
    * caller (e.g. the NL route) can't name a within-key-varying column. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame,
                      largeKey: String, smallKey: String,
                      buckets: Int): DataFrame =
    saltedInnerJoin(large, small, largeKey, smallKey,
                    struct(large.columns.map(col): _*), buckets)

  def saltedInnerJoin(large: DataFrame, small: DataFrame,
                      largeKey: String, smallKey: String,
                      uniquifier: Column, buckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt", salt(uniquifier, buckets))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(replicatedSmall,
        saltedLarge(largeKey) === replicatedSmall(smallKey) &&
        saltedLarge("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }
}
