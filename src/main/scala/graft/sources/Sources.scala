package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources — the engine's scan surface (SURVEY.md §2.2 S1/S2).
  *
  * CSV mirrors the reference's `pd.read_csv` semantics: first row is the
  * header, dtypes inferred (agentic_workflow_transformation.py:307).
  * Parquet is this engine's primary format (columnar, splittable,
  * predicate-pushdown-able — the right scan at 100 TB; TESTDATA.md tables
  * are parquet).
  */
object Sources {

  /** S1 — CSV scan with header + inferred schema.
    * At scale prefer an explicit schema (inferSchema is a full extra pass);
    * pass `schemaDdl` to skip inference. */
  def csv(spark: SparkSession, path: String, schemaDdl: Option[String] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schemaDdl match {
      case Some(ddl) => base.schema(ddl).csv(path)
      case None      => base.option("inferSchema", "true").csv(path)
    }
  }

  /** Primary columnar scan. Filters/projections over this are pushed into
    * the parquet reader by Catalyst (PushedFilters / ReadSchema). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines scan — the file form of the reference's row-dict records
    * (S2). Schema inferred unless `schemaDdl` given (at scale always give
    * it: inference is a full extra pass). */
  def jsonLines(spark: SparkSession, path: String,
                schemaDdl: Option[String] = None): DataFrame =
    schemaDdl match {
      case Some(ddl) => spark.read.schema(ddl).json(path)
      case None      => spark.read.json(path)
    }

  /** ORC scan — the other splittable columnar format Spark ships a
    * vectorized, pushdown-capable reader for; interchange with
    * Hive-lineage warehouses. Same scan guarantees as [[parquet]]. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Named testdata table from a scale-factor directory (TESTDATA.md). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** S2 — in-memory records source (the reference's inline `List[Dict]`
    * fallback, agentic_workflow_transformation.py:321-325). */
  def inMemory(spark: SparkSession, rows: Seq[(String, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("name", "age", "city")
  }

  /** The reference's canonical 10-row fixture (input.csv:1-11), used by
    * unit tests and the eval harness when no CSV is supplied. */
  def canonicalSample(spark: SparkSession): DataFrame = inMemory(spark, Seq(
    ("Alice", 25L, "New York"),
    ("Bob", 35L, "Los Angeles"),
    ("Charlie", 32L, "Chicago"),
    ("Diana", 45L, "Seattle"),
    ("Ethan", 29L, "Boston"),
    ("Fiona", 41L, "San Francisco"),
    ("George", 38L, "Denver"),
    ("Hannah", 22L, "Miami"),
    ("Ian", 50L, "Austin"),
    ("Jasmine", 31L, "Portland")))
}
