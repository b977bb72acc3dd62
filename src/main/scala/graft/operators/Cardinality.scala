package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

import graft.functions.{HllFunctions, HllKernel}

/** Mergeable distinct-count sketches ([[graft.functions.HllKernel]]).
  *
  * The operational pattern this enables at 100 TB: `sketchBy` once per
  * ingest partition (map-side partial aggregation — registers, not keys,
  * cross the wire), persist the 2^p-byte sketches, then answer any
  * later rollup with [[mergeSketches]] over the tiny sketch table —
  * never rescanning the raw corpus. Register-max merging makes shard
  * boundaries invisible: merged sketches are bit-identical to a direct
  * sketch of the union.
  */
object Cardinality {

  final case class Regs(regs: Array[Byte])

  /** Sketch a long key column. */
  final class HllAgg(p: Int = 12) extends Aggregator[Long, Regs, Array[Byte]] {
    override def zero: Regs = Regs(HllKernel.emptyRegs(p))
    override def reduce(b: Regs, key: Long): Regs = { HllKernel.add(b.regs, key); b }
    override def merge(a: Regs, b: Regs): Regs = { HllKernel.merge(a.regs, b.regs); a }
    override def finish(r: Regs): Array[Byte] = r.regs
    override def bufferEncoder: Encoder[Regs] = Encoders.product
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge already-built sketches (e.g. per-day partials). */
  final class HllMergeAgg(p: Int = 12) extends Aggregator[Array[Byte], Regs, Array[Byte]] {
    override def zero: Regs = Regs(HllKernel.emptyRegs(p))
    override def reduce(b: Regs, s: Array[Byte]): Regs = { HllKernel.merge(b.regs, s); b }
    override def merge(a: Regs, b: Regs): Regs = { HllKernel.merge(a.regs, b.regs); a }
    override def finish(r: Regs): Array[Byte] = r.regs
    override def bufferEncoder: Encoder[Regs] = Encoders.product
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Per-`groupCol` binary HLL sketch of `keyCol` (one shuffle of
    * registers). Output: groupCol, `sketch`. */
  def sketchBy(df: DataFrame, groupCol: String, keyCol: String,
               p: Int = 12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null keys are skipped — countDistinct ignores them too, so the
    // estimate stays comparable to the exact count; the group column is
    // cast to string so integer/date group domains sketch through the
    // same typed path
    df.select(col(groupCol).cast("string"), col(keyCol).cast("long"))
      .filter(col(keyCol).isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new HllAgg(p).toColumn.name("sketch"))
      .toDF(groupCol, "sketch")
  }

  /** Merge a frame of (groupCol…, sketch) partial sketches down to one
    * sketch per `groupCol`. */
  def mergeSketches(sketches: DataFrame, groupCol: String,
                    p: Int = 12): DataFrame = {
    val spark = sketches.sparkSession
    import spark.implicits._
    sketches.select(col(groupCol).cast("string"), col("sketch"))
      .as[(String, Array[Byte])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new HllMergeAgg(p).toColumn.name("sketch"))
      .toDF(groupCol, "sketch")
  }

  /** Estimate column over a sketch. */
  def estimate(sketch: Column): Column = HllFunctions.hllEstimate(sketch)
}
