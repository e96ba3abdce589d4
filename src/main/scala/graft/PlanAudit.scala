package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps the formatted physical plan of every registered query to
  * PLANS.md — the audit trail for scan pruning (`ReadSchema`,
  * `PushedFilters`), join strategies (broadcast vs shuffle), and
  * whole-stage-codegen coverage. Run after operator changes:
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.001 PLANS.md"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosAsLong, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    write(spark, sfDir, out)
    spark.stop()
  }

  /** Dump every registered query's formatted plan to `out`. Also
    * called from [[Verify]] at the end of the driver's correctness run
    * — regeneration is part of the round loop, so the audit cannot
    * silently drift from HEAD when operators land (it did in r5:
    * q57/q58/WARC were outside it).
    */
  def write(spark: SparkSession, sfDir: String, out: String): Unit = {
    val sb = new StringBuilder
    sb.append("# Physical plan audit (explain formatted)\n\n")
    sb.append(s"Generated against `$sfDir`. Things to check per plan:\n")
    sb.append("`PushedFilters` non-empty where a filter exists, `ReadSchema` pruned\n")
    sb.append("to used columns, small dims as `BroadcastHashJoin`, aggregates with\n")
    sb.append("`HashAggregate` partial/final pairs, top-k as `TakeOrderedAndProject`.\n\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      sb.append(s"## $name\n\n```\n$plan\n```\n\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
  }
}
