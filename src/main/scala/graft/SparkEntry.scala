package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator's QueryDef (Spark implementation + DuckDB oracle
  * SQL) from the `graft.operators` package.
  */
object SparkEntry {

  /** Full inventory, one QueryDef per implemented operator (SURVEY.md §2). */
  def all: Seq[QueryDef] =
    operators.Relational.defs ++ operators.Scalars.defs ++
      operators.EventTime.defs ++ operators.Dedup.defs ++
      operators.Similarity.defs ++ operators.TextAnalysis.defs ++
      operators.StreamLog.defs ++ operators.UdfSurface.defs ++
      operators.Advanced.defs ++ operators.Extras.defs ++
      operators.Pipeline.defs ++ operators.Multimodal.defs ++
      operators.WebCorpus.defs ++ operators.Retrieval.defs ++
      operators.Evaluation.defs ++ operators.Release.defs ++
      operators.Monitoring.defs ++ operators.Training.defs ++
      operators.Assembly.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracleSql.map(d.name -> _)).toMap
}
