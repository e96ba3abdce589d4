package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{CurationOps, GraphOps, InferenceOps, LinkOps, Relational, ScaleOps, SimilarityOps, StreamingBatchOps, TextOps, TokenizerOps, WarcOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is registered here as a
  * `(SparkSession, sfDir) => DataFrame` factory; the SQL-expressible
  * ones carry a DuckDB oracle for the driver's correctness gate.
  */
object SparkEntry {

  private def allOps: Seq[GraftQuery] =
    Relational.all ++ LinkOps.all ++ TextOps.all ++ SimilarityOps.all ++
      StreamingBatchOps.all ++ ScaleOps.all ++ GraphOps.all ++ InferenceOps.all ++
      WarcOps.all ++ TokenizerOps.all ++ CurationOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01_agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allOps.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
