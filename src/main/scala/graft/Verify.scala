package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional third arg: comma-separated query names — the dev loop
    // for ONE new operator (skips the full sweep + plan audit); the
    // driver always calls with exactly (sfDir, outDir)
    val (sfDir, outDir, only) = (args: @unchecked) match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, n) => (s, o, Some(n.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // correctness-dump mode: oracle-input dumps (q76) are written only
    // here, so Bench measures production plans (see GraftConf.oracleDumps)
    sys.props("graft.oracle.dumps") = "1"
    val spark = GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // regenerate the plan audit every verify run, so it cannot drift
    // from HEAD when operators land (r5 shipped a stale PLANS.md) —
    // best-effort: an audit failure must not zero the correctness dump.
    // Skipped for filtered dev-loop runs (PLANS.md documents HEAD, and
    // a partial audit would clobber the full one).
    if (only.isEmpty)
      try PlanAudit.write(spark, sfDir, "PLANS.md")
      catch { case e: Throwable =>
        System.err.println(s"[verify] plan audit failed: ${e.getMessage}")
      }
    spark.stop()
  }
}
