package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator from SURVEY.md §2: a Spark plan factory plus, when the
  * semantics are ANSI-SQL-expressible, a DuckDB oracle query over the
  * same parquet tables.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None
)
