package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.sources.Sources

/** The reference's 20-description eval corpus
  * (agentic_workflow_transformation.py:339-362) ported to the driver's
  * `customer` table (FIXTURES.md §4 column mapping: name↔c_name,
  * age↔c_acctbal, city↔c_mktsegment; thresholds scaled to the acctbal
  * domain). Every query runs through the full NL parse → plan IR →
  * compile path — so the DuckDB oracle validates the whole engine
  * lifecycle, not just hand-written DataFrame code. The verbatim original
  * descriptions are covered on the canonical 10-row fixture by
  * EvalCorpusSpec.
  */
object EvalQueries extends QueryPack {

  /** (query name, adapted description, DuckDB oracle SQL). */
  val cases: Seq[(String, String, String)] = Seq(
    ("eval01_filter_select",
     "Filter rows where c_acctbal > 3000 and select columns c_name and c_acctbal.",
     "SELECT c_name, c_acctbal FROM customer WHERE c_acctbal > 3000"),
    ("eval02_str_eq",
     "Filter rows where c_mktsegment == 'BUILDING' and select c_name, c_mktsegment.",
     "SELECT c_name, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'"),
    ("eval03_le",
     "Filter rows where c_acctbal <= 3000 and select c_name and c_acctbal.",
     "SELECT c_name, c_acctbal FROM customer WHERE c_acctbal <= 3000"),
    ("eval04_sort_topk",
     "Sort by c_acctbal descending and keep top 3 rows.",
     "SELECT * FROM customer ORDER BY c_acctbal DESC LIMIT 3"),
    ("eval05_group_count",
     "Group by c_mktsegment and count c_name.",
     "SELECT c_mktsegment, count(c_name) AS \"count\" FROM customer GROUP BY c_mktsegment"),
    ("eval06_derive_bool",
     "Add is_rich column where is_rich = c_acctbal >= 5000.",
     "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, " +
       "(c_acctbal >= 5000) AS is_rich FROM customer"),
    ("eval07_startswith",
     "Select rows where c_name starts with 'Customer#00000001' and select c_name, c_mktsegment.",
     "SELECT c_name, c_mktsegment FROM customer WHERE c_name LIKE 'Customer#00000001%'"),
    ("eval08_rename",
     "Rename c_name to customer_name.",
     "SELECT c_custkey, c_name AS customer_name, c_nationkey, c_acctbal, c_mktsegment FROM customer"),
    ("eval09_drop",
     "Drop c_mktsegment column.",
     "SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer"),
    ("eval10_empty_result",
     "Filter rows where c_acctbal > 99999",
     "SELECT * FROM customer WHERE c_acctbal > 99999"),
    ("eval11_and_select",
     "Filter rows where c_acctbal > 3000 AND c_mktsegment == 'BUILDING' and select c_name, c_acctbal, c_mktsegment.",
     "SELECT c_name, c_acctbal, c_mktsegment FROM customer " +
       "WHERE c_acctbal > 3000 AND c_mktsegment = 'BUILDING'"),
    ("eval12_or",
     "Filter rows where c_acctbal > 9000 OR c_mktsegment == 'BUILDING' and select c_name, c_acctbal.",
     "SELECT c_name, c_acctbal FROM customer WHERE c_acctbal > 9000 OR c_mktsegment = 'BUILDING'"),
    ("eval13_between_prefix",
     "Filter rows where c_acctbal between 3000 and 4500 and c_name starts with 'Customer#0000001'.",
     "SELECT * FROM customer WHERE c_acctbal BETWEEN 3000 AND 4500 " +
       "AND c_name LIKE 'Customer#0000001%'"),
    ("eval14_paren_compound",
     "Select rows where (c_acctbal > 3000 AND c_mktsegment == 'MACHINERY') OR (c_acctbal <= 2500 AND c_mktsegment == 'BUILDING').",
     "SELECT * FROM customer WHERE (c_acctbal > 3000 AND c_mktsegment = 'MACHINERY') " +
       "OR (c_acctbal <= 2500 AND c_mktsegment = 'BUILDING')"),
    ("eval15_prefix_and_le",
     "Select rows where c_name starts with 'Customer#0000002' and c_acctbal <= 3500.",
     "SELECT * FROM customer WHERE c_name LIKE 'Customer#0000002%' AND c_acctbal <= 3500"),
    ("eval16_in_list",
     "Filter rows where c_acctbal > 3000 and c_mktsegment in ('MACHINERY', 'FURNITURE').",
     "SELECT * FROM customer WHERE c_acctbal > 3000 AND c_mktsegment IN ('MACHINERY', 'FURNITURE')"),
    ("eval17_not",
     "Filter rows where c_acctbal > 3000 and not c_mktsegment == 'AUTOMOBILE'.",
     "SELECT * FROM customer WHERE c_acctbal > 3000 AND NOT (c_mktsegment = 'AUTOMOBILE')"),
    ("eval18_sort_filter_topk",
     "Sort by c_acctbal desc and then filter c_acctbal > 3000 and keep top 2.",
     "SELECT * FROM (SELECT * FROM customer ORDER BY c_acctbal DESC) " +
       "WHERE c_acctbal > 3000 ORDER BY c_acctbal DESC LIMIT 2"),
    ("eval19_group_avg_having",
     "Group by c_mktsegment and show average c_acctbal where average_c_acctbal > 3000.",
     "SELECT c_mktsegment, round(avg(c_acctbal), 4) AS average_c_acctbal FROM customer " +
       "GROUP BY c_mktsegment HAVING avg(c_acctbal) > 3000"),
    ("eval20_contains_between",
     "Filter where c_name contains '42' and c_acctbal between 3000 and 5000.",
     "SELECT * FROM customer WHERE c_name LIKE '%42%' AND c_acctbal BETWEEN 3000 AND 5000"))

  /** Double-valued aggregate outputs are rounded on BOTH sides (here and in
    * the oracle SQL) so Spark-vs-DuckDB floating summation order can't flip
    * the hash compare. */
  private def postProcess(name: String, df: DataFrame): DataFrame = name match {
    case "eval19_group_avg_having" =>
      df.withColumn("average_c_acctbal", round(col("average_c_acctbal"), 4))
    case _ => df
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] =
    cases.map { case (name, desc, _) =>
      name -> ((spark: SparkSession, sfDir: String) =>
        postProcess(name, Engine.run(desc, Sources.table(spark, sfDir, "customer"))))
    }.toMap

  override val oracleSql: Map[String, String] =
    cases.map { case (name, _, sql) => name -> sql }.toMap
}
