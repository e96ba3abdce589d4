package graft

import graft.plans.RewriteCappedCollectToBounded
import org.apache.spark.sql.functions._

class RewriteCappedCollectSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(RewriteCappedCollectToBounded))
      exp.extraOptimizations = exp.extraOptimizations :+ RewriteCappedCollectToBounded
    try f
    finally exp.extraOptimizations =
      exp.extraOptimizations.filterNot(_ == RewriteCappedCollectToBounded)
  }

  // one hot key (40 members, over every cap used here) + cold keys
  private def rows = {
    import spark.implicits._
    ((0L until 40L).map(i => ("hot", i)) ++
      (0L until 60L).map(i => (s"k${i % 20}", i)))
      .toDF("k", "v").repartition(5)
  }

  test("collect_set + size cap rewrites to bounded_collect_set, same result") {
    import spark.implicits._
    val q = () => rows.groupBy($"k")
      .agg(sort_array(collect_set($"v")).as("ids"))
      .filter(size($"ids").between(2, 8))
    val expect = q().collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    withRule {
      val df = q()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("bounded_collect_set"), s"rewrite did not fire:\n$plan")
      assert(!"(?<!bounded_)collect_set\\(".r.findFirstIn(plan).isDefined,
        s"unbounded aggregate survived:\n$plan")
      val got = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      assert(got == expect, "rewrite changed the result")
      assert(!got.contains("hot"), "the hot key must be dropped by both spellings")
      assert(got.nonEmpty)
    }
  }

  test("plain (unsorted) collect_set with <= cap also rewrites") {
    import spark.implicits._
    val q = () => rows.groupBy($"k")
      .agg(collect_set($"v").as("ids")).filter(size($"ids") <= 8)
    val expect = q().collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).sorted.toList).toMap
    withRule {
      val df = q()
      assert(df.queryExecution.executedPlan.toString.contains("bounded_collect_set"))
      // sorted output is a valid instance of collect_set's unordered
      // contract — compare as sets-rendered-sorted
      val got = df.collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).sorted.toList).toMap
      assert(got == expect)
    }
  }

  test("declines collect_list (size counts duplicates) and capless filters") {
    import spark.implicits._
    withRule {
      val list = rows.groupBy($"k").agg(collect_list($"v").as("ids"))
        .filter(size($"ids") <= 8)
      assert(!list.queryExecution.executedPlan.toString.contains("bounded_collect_set"))
      val capless = rows.groupBy($"k").agg(collect_set($"v").as("ids"))
        .filter(size($"ids") >= 2)
      assert(!capless.queryExecution.executedPlan.toString.contains("bounded_collect_set"))
    }
  }

  test("fires through a collapsed projection (predicate pushdown normalizes the shape)") {
    import spark.implicits._
    // the user writes the cap over a projected size column; Catalyst's
    // own predicate pushdown substitutes it below the Project BEFORE
    // this rule runs, normalizing to the direct Filter(Aggregate)
    // shape — so the guard applies here too, and the surviving rows'
    // arrays (and their projected sizes) are complete either way
    val q = () => rows.groupBy($"k").agg(collect_set($"v").as("ids"))
      .select($"k", $"ids", size($"ids").as("n"))
      .filter($"n" <= 8)
    val expect = q().collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).sorted.toList, r.getInt(2))).toSet
    withRule {
      val df = q()
      assert(df.queryExecution.executedPlan.toString.contains("bounded_collect_set"))
      val got = df.collect()
        .map(r => (r.getString(0), r.getSeq[Long](1).sorted.toList, r.getInt(2))).toSet
      assert(got == expect)
    }
  }

  test("q68_cocitation gets the guard from the rule alone, results unchanged") {
    // the driver-gated query is WRITTEN with plain collect_set; under
    // the rule (as in every GraftConf session) it must plan bounded
    // and produce the identical pair counts
    val q = () => graft.operators.LinkOps.q68_cocitation.run(spark, sfDir)
    val expect = q().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(expect.nonEmpty)
    withRule {
      val df = q()
      assert(df.queryExecution.executedPlan.toString.contains("bounded_collect_set"),
        "the library rule must harden the user spelling")
      val got = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got == expect)
    }
  }

  test("several caps on one column enforce the tightest (not an arbitrary one)") {
    import spark.implicits._
    // keys have 1..20 distinct values; size<=8 AND size<=5 must keep
    // exactly the <=5 band — an arbitrary-cap bug would leak 6..8
    val data = (1 to 20).flatMap(k => (1L to k.toLong).map(v => (s"k$k", v)))
      .toDF("k", "v").repartition(3)
    val q = () => data.groupBy($"k").agg(collect_set($"v").as("ids"))
      .filter(size($"ids") <= 8 && size($"ids") <= 5)
    val expect = q().collect().map(_.getString(0)).sorted.toSeq
    withRule {
      val df = q()
      assert(df.queryExecution.executedPlan.toString.contains("bounded_collect_set"))
      val got = df.collect().map(_.getString(0)).sorted.toSeq
      assert(got == expect && got == (1 to 5).map(i => s"k$i").sorted)
    }
  }

  test("declines a disjunctive cap (OR branch may keep over-cap keys)") {
    import spark.implicits._
    withRule {
      val df = rows.groupBy($"k").agg(collect_set($"v").as("ids"))
        .filter(size($"ids") <= 8 || $"k" === "hot")
      assert(!df.queryExecution.executedPlan.toString.contains("bounded_collect_set"))
      // the hot key must SURVIVE this query — dropping it would be the
      // bug the conjunct-only matching prevents
      assert(df.collect().exists(_.getString(0) == "hot"))
    }
  }
}
