package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** The engine couples to the driver's fixture schemas at every load site
  * (events.ts, documents.text, embeddings.embedding, orders/lineitem
  * dates, props JSON). A driver-side regeneration that drifts a column
  * should fail HERE with a named message — not as 20 cryptic plan errors
  * downstream (the exact failure mode of the round-9 events.ts drift).
  *
  * Drift-prone temporal columns accept the encodings the fixture has
  * actually shipped (TIMESTAMP / TIMESTAMP_NTZ / legacy nanos BIGINT —
  * all normalized by Events.normalizeEventTime); everything else is
  * pinned exactly.
  */
class FixtureSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val temporal: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType, DateType)

  private def assertShape(table: String, expect: Seq[(String, Either[DataType, String])]): Unit = {
    val schema = spark.read.parquet(s"$sfDir/$table.parquet").schema
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    expect.foreach { case (colName, want) =>
      val got = byName.getOrElse(colName,
        fail(s"$table: expected column '$colName' missing; has ${schema.fieldNames.mkString(", ")}"))
      want match {
        case Left(ArrayType(elem, _)) =>
          // element nullability is a parquet-writer detail, not a contract
          got match {
            case ArrayType(gotElem, _) => assert(gotElem == elem,
              s"$table.$colName: expected array<$elem>, fixture now carries $got")
            case _ => fail(s"$table.$colName: expected array<$elem>, fixture now carries $got")
          }
        case Left(dt) => assert(got == dt,
          s"$table.$colName: expected $dt, fixture now carries $got")
        case Right("temporal") => assert(temporal.contains(got),
          s"$table.$colName: expected a temporal encoding, fixture now carries $got")
        case Right(other) => fail(s"unknown expectation kind $other")
      }
    }
  }

  private def t(dt: DataType): Either[DataType, String] = Left(dt)
  private val temporalCol: Either[DataType, String] = Right("temporal")

  test("region/nation/customer/supplier/part shapes") {
    assertShape("region", Seq("r_regionkey" -> t(IntegerType), "r_name" -> t(StringType)))
    assertShape("nation", Seq("n_nationkey" -> t(IntegerType), "n_name" -> t(StringType),
      "n_regionkey" -> t(IntegerType)))
    assertShape("customer", Seq("c_custkey" -> t(LongType), "c_name" -> t(StringType),
      "c_nationkey" -> t(IntegerType), "c_acctbal" -> t(DoubleType),
      "c_mktsegment" -> t(StringType)))
    assertShape("supplier", Seq("s_suppkey" -> t(LongType), "s_name" -> t(StringType),
      "s_nationkey" -> t(IntegerType), "s_acctbal" -> t(DoubleType)))
    assertShape("part", Seq("p_partkey" -> t(LongType), "p_name" -> t(StringType),
      "p_brand" -> t(StringType), "p_type" -> t(StringType),
      "p_size" -> t(IntegerType), "p_retailprice" -> t(DoubleType)))
  }

  test("orders/lineitem shapes (dates temporal-flexible)") {
    assertShape("orders", Seq("o_orderkey" -> t(LongType), "o_custkey" -> t(LongType),
      "o_orderstatus" -> t(StringType), "o_totalprice" -> t(DoubleType),
      "o_orderdate" -> temporalCol, "o_orderpriority" -> t(StringType)))
    assertShape("lineitem", Seq("l_orderkey" -> t(LongType), "l_partkey" -> t(LongType),
      "l_suppkey" -> t(LongType), "l_linenumber" -> t(IntegerType),
      "l_quantity" -> t(DoubleType), "l_extendedprice" -> t(DoubleType),
      "l_discount" -> t(DoubleType), "l_tax" -> t(DoubleType),
      "l_returnflag" -> t(StringType), "l_linestatus" -> t(StringType),
      "l_shipdate" -> temporalCol))
  }

  test("events shape: ts in a supported encoding, props as JSON string") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assertShape("events", Seq("event_id" -> t(LongType), "ts" -> temporalCol,
      "user_id" -> t(LongType), "event_type" -> t(StringType),
      "value" -> t(DoubleType), "props" -> t(StringType)))
  }

  test("documents/embeddings shapes: text string, embedding array<float>") {
    assertShape("documents", Seq("doc_id" -> t(LongType), "text" -> t(StringType),
      "lang" -> t(StringType), "source" -> t(StringType), "n_chars" -> t(LongType)))
    assertShape("embeddings", Seq("vec_id" -> t(LongType),
      "embedding" -> t(ArrayType(FloatType)), "label" -> t(IntegerType)))
  }
}
