package graft

import graft.queries.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented capability from SURVEY §2 (plus the beyond-parity
  * pipeline operators) registers a `QueryDef`; `queries`/`oracleSql` are
  * derived views of that registry.
  */
object SparkEntry {

  def all: Seq[QueryDef] =
    queries_relational ++ queries_rdf ++ queries_pipeline ++ queries_streams

  private def queries_relational = graft.queries.Relational.defs
  private def queries_rdf = graft.queries.Rdf.defs
  private def queries_pipeline = graft.queries.Pipeline.defs
  private def queries_streams = graft.queries.Streams.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "rdf_q1_chain").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
