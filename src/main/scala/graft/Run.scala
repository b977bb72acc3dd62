package graft


import graft.sources.Sources

/** Single-shot CLI — the reference's default entry point
  * (`python agentic_workflow_transformation.py`,
  * agentic_workflow_transformation.py:317-330, 398-400): run ONE
  * transformation description against an input table (or the canonical
  * inline sample), write the result CSV, report validity.
  *
  * Input format dispatches on extension: `.parquet` (including the
  * driver's nanosecond-timestamped events table, whose `ts` is derived
  * µs-exactly as in [[graft.operators.Events.load]]), `.json`/`.jsonl`,
  * anything else CSV — so the full NL surface (dedup, sampling,
  * sessionize, multimodal, spans) is drivable from this entry point
  * against the corpus tables, not just the 10-row CSV.
  *
  * Usage: runMain graft.Run [description] [input] [outDir] [name=path ...]
  *
  * Trailing `name=path` arguments bind catalog tables for the two-table
  * descriptions ("… spans with benchmark", "join … to signups as of …"):
  * each path loads with the same format dispatch as the input.
  */
object Run {
  /** The reference's default description (agentic_workflow_transformation.py:318). */
  val DefaultDescription = "Filter rows where age > 30 and select columns name and age."

  def main(args: Array[String]): Unit = {
    val description = args.lift(0).filter(_.nonEmpty).getOrElse(DefaultDescription)
    val inputCsv = args.lift(1).filter(_.nonEmpty)
    val outDir = args.lift(2).getOrElse("run_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus, "graft-run")
    spark.sparkContext.setLogLevel("WARN")

    def load(path: String): org.apache.spark.sql.DataFrame = path match {
      // a manifested event-log table (directory with manifest-*.txt):
      // resolve through the newest manifest, normalized like any events
      // input — `graft.Run "<description>" /path/to/events_log`
      case p if graft.operators.ManifestedLog.readManifestOpt(spark, p).isDefined =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        graft.operators.ManifestedLog.load(spark, p)
      // a persisted vector index (directory with index-manifest-*.txt):
      // reads as its indexed vectors; "Search the index …" verbs bind
      // the path and probe it in place
      case p if graft.operators.IvfIndex.versions(spark, p).nonEmpty =>
        graft.operators.IvfIndex.read(spark, p)
      // a persisted inverted index (directory with lex-manifest-*.txt):
      // reads as its postings; "Search the lexical index …" probes it
      case p if graft.operators.LexIndex.versions(spark, p).nonEmpty =>
        graft.operators.LexIndex.readPostings(spark, p)
      case p if p.endsWith(".parquet") =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = Sources.parquet(spark, p)
        // Normalize ts only for tables following the events convention —
        // a generic parquet with an incidental `ts` column keeps its
        // schema verbatim (no surprise ts_us column / NTZ retype on
        // select-* over arbitrary files).
        if (graft.operators.Events.isEventsShaped(df))
          graft.operators.Events.normalizeEventTimeIfPossible(df)
        else df
      case p if p.endsWith(".json") || p.endsWith(".jsonl") =>
        Sources.jsonLines(spark, p)
      case p if p.endsWith(".orc") => Sources.orc(spark, p)
      case p => Sources.csv(spark, p)
    }

    val input = inputCsv.map(load).getOrElse(Sources.canonicalSample(spark))
    // a manifested input additionally binds its PATH, so maintenance /
    // time-travel verbs ("Read the table at version 2", "Compact closed
    // days …", "Vacuum …") can act on the table itself
    val tablePath = inputCsv.filter(p =>
      graft.operators.ManifestedLog.readManifestOpt(spark, p).isDefined ||
      graft.operators.IvfIndex.versions(spark, p).nonEmpty ||
      graft.operators.LexIndex.versions(spark, p).nonEmpty)
    // the reserved binding `vectorindex=<ivf-index-dir>` attaches a
    // SECOND persisted index for the two-store serving sentences
    // ("Search the lexical index … fused with vector […] …") — the
    // lexical index is the input, the vector index binds here
    val bindings = args.drop(3).map { binding =>
      binding.split("=", 2) match {
        case Array(name, path) if name.nonEmpty && path.nonEmpty => name -> path
        case _ => sys.error(s"expected name=path table binding, got '$binding'")
      }
    }
    val vectorIndexPath = bindings.collectFirst {
      case ("vectorindex", p) => p }
    val catalog = bindings.filterNot(_._1 == "vectorindex")
      .map { case (name, path) => name -> load(path) }.toMap
    val finalState = Engine.invoke(
      TransformState(description, input), outDir = Some(outDir),
      catalog = catalog, tablePath = tablePath,
      vectorIndexPath = vectorIndexPath)
    println(s"description : $description")
    println(s"plan        : ${finalState.plan.get.ops.mkString(" -> ")}")
    println(s"output      : ${finalState.outputPath.get}")
    println(s"valid       : ${finalState.valid.get}" +
      (if (finalState.validationErrors.nonEmpty)
         finalState.validationErrors.mkString(" [", "; ", "]") else ""))
    finalState.result.get.show(20, truncate = false)
    spark.stop()
  }
}
