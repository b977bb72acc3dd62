package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}

import org.apache.spark.sql.DataFrame
import scala.jdk.CollectionConverters._

/** Sinks (SURVEY.md §2.2 S3/S4).
  *
  * The reference writes a single CSV named
  * `transform_{slug}_{UTC-timestamp}.csv` with header and no row index
  * (agentic_workflow_transformation.py:114-118,152), producing a header-only
  * file for empty results (AGENTIC_WORKFLOW.md:87). We reproduce that
  * contract for the single-file case, and expose partitioned parquet/CSV
  * writers as the scale path — a single-file CSV collapse is only for
  * human-facing exports, never for 100 TB outputs.
  */
object Sinks {

  /** Same slug regex as the reference: non-alphanumeric runs → `_`
    * (agentic_workflow_transformation.py:115). */
  def slug(description: String, maxLen: Int = 40): String =
    description.replaceAll("[^A-Za-z0-9]+", "_").take(maxLen).stripSuffix("_")

  def timestampedName(description: String,
                      now: ZonedDateTime = ZonedDateTime.now(ZoneOffset.UTC)): String = {
    val ts = now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    s"transform_${slug(description)}_$ts.csv"
  }

  /** Render columns the CSV datasource rejects (arrays, structs, maps,
    * binary) as text — JSON for complex types, hex for bytes — so every
    * NL verb's result is exportable through [[csvSingleFile]] (an index
    * read carries `embedding: array<float>`; a PQ index adds `codes`).
    * The single-file CSV is the human-facing path; lossless text
    * rendering is the right contract there. Scale outputs go through
    * [[parquetPartitioned]], which keeps the native types. */
  private def csvSafe(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, hex, to_json}
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: ArrayType | _: StructType | _: MapType =>
          to_json(col(f.name)).as(f.name)
        case BinaryType => hex(col(f.name)).as(f.name)
        case _          => col(f.name)
      }
    }
    val needsRewrite = df.schema.fields.exists(f => f.dataType match {
      case _: ArrayType | _: StructType | _: MapType | BinaryType => true
      case _ => false
    })
    if (needsRewrite) df.select(cols.toIndexedSeq: _*) else df
  }

  /** S3 — single-file CSV export with header; header-only when empty.
    * Writes via a temp directory then renames the lone part file to the
    * target name. Returns the final file path. */
  def csvSingleFile(df0: DataFrame, outDir: String, fileName: String): Path = {
    val df = csvSafe(df0)
    val target = Paths.get(outDir, fileName)
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempDirectory(Paths.get(outDir), ".csv_out")
    val tmpStr = tmp.resolve("data").toString
    df.coalesce(1).write.option("header", "true").mode("overwrite").csv(tmpStr)
    val part = Files.list(Paths.get(tmpStr)).iterator.asScala
      .find(p => p.getFileName.toString.startsWith("part-"))
    part match {
      case Some(p) => Files.move(p, target, StandardCopyOption.REPLACE_EXISTING)
      case None    =>
        // Empty input partition set: Spark wrote no part file. The reference
        // contract (AGENTIC_WORKFLOW.md:87) is a header-only CSV.
        Files.writeString(target, df.columns.mkString(",") + "\n")
    }
    deleteRecursively(tmp)
    target
  }

  /** The scale-path sink: partitioned parquet, optionally repartitioned on
    * write keys so downstream scans prune partitions. */
  def parquetPartitioned(df: DataFrame, path: String,
                         partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator.asScala.toList.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
