package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY.md §2 registers a [[QueryDef]]
  * in one of the `graft.queries.*` modules; this object is just the
  * aggregation point the driver calls.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    queries_relational ++ queries_extensions

  private def queries_relational: Seq[QueryDef] =
    graft.queries.Relational.defs ++ graft.queries.PipelineOps.defs ++
      graft.queries.Advanced.defs ++ graft.queries.Scalars.defs
  private def queries_extensions: Seq[QueryDef] =
    graft.queries.TextOps.defs ++ graft.queries.DedupOps.defs ++
      graft.queries.SimilarityOps.defs ++ graft.queries.MultimodalOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full two-pass daily fact refresh (E3, reference
    * runner.py:589-874) — scan→broadcast-dim joins→hash aggregates→
    * full-outer metric join→regex pivot→two MERGEs — the reference's
    * flagship analytical pipeline end-to-end.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q60_fact_staff_daily")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
