package graft

import graft.operators.InferenceOps
import graft.operators.InferenceOps.{DocFeatures, DocScore}
import org.apache.spark.sql.functions._

class InferenceOpsSpec extends SparkSpec {

  test("batched scoring equals record-at-a-time scoring (batching is transparent)") {
    import spark.implicits._
    val fs = (1 to 200).map(i =>
      DocFeatures(i.toLong, n_tokens = i * 3 % 97, n_chars = i * 17 % 503,
        stop_hits = i % 11))
    val batched = InferenceOps.score(fs.toDS()).collect().sortBy(_.doc_id).toSeq
    val oneAtATime = fs.flatMap(f => InferenceOps.scoreBatch(Seq(f)))
    assert(batched == oneAtATime)
    // the squash stays in (-1, 1) and keep matches the score's sign
    batched.foreach { s =>
      assert(s.score > -1.0 && s.score < 1.0)
      assert((s.keep == 1) == (s.score > 0.0))
    }
  }

  test("q57 scores every document, produces both classes, and never shuffles") {
    val out = InferenceOps.q57_classifier_filter.run(spark, sfDir)
    val rows = out.collect()
    val total = Tables.table(spark, sfDir, "documents").count()
    assert(rows.length.toLong == total, "one verdict per document")
    val keeps = rows.map(_.getAs[Int]("keep")).toSet
    assert(keeps == Set(0, 1), s"fixture must exercise both classes, got $keeps")
    // partition-preserving: no Exchange anywhere in the scoring plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("q58 respects per-stratum caps and is deterministic") {
    val out = InferenceOps.q58_classifier_strata.run(spark, sfDir).collect()
    val caps = Map(3 -> 40, 2 -> 30, 1 -> 20, 0 -> 10)
    val byStratum = out.groupBy(_.getAs[Int]("stratum"))
    assert(byStratum.nonEmpty)
    byStratum.foreach { case (st, rows) =>
      assert(caps.contains(st), s"unexpected stratum $st")
      assert(rows.length <= caps(st), s"stratum $st over cap: ${rows.length}")
      // ranks are 1..n within the stratum
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rows.length))
      // every sampled row's score is inside its stratum's band
      rows.foreach { r =>
        val sc = r.getAs[Double]("score")
        st match {
          case 3 => assert(sc >= 0.5)
          case 2 => assert(sc >= 0.0 && sc < 0.5)
          case 1 => assert(sc >= -0.5 && sc < 0.0)
          case 0 => assert(sc < -0.5)
        }
      }
    }
    // determinism: the md5 draw makes re-runs identical
    val again = InferenceOps.q58_classifier_strata.run(spark, sfDir).collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("classifierStrata honors arbitrary boundaries/caps (model-swap path)") {
    // a 2-strata config: good (score >= 0) capped at 7, bad capped at 3
    val out = InferenceOps.classifierStrata(spark, sfDir,
      boundaries = Seq(0.0), caps = Seq(3, 7)).collect()
    val byStratum = out.groupBy(_.getAs[Int]("stratum"))
    assert(byStratum.keySet.subsetOf(Set(0, 1)))
    assert(byStratum.getOrElse(1, Array.empty).length <= 7)
    assert(byStratum.getOrElse(0, Array.empty).length <= 3)
    out.foreach { r =>
      val sc = r.getAs[Double]("score")
      if (r.getAs[Int]("stratum") == 1) assert(sc >= 0.0) else assert(sc < 0.0)
    }
    // misconfiguration fails loudly, not with a wrong sample
    intercept[IllegalArgumentException] {
      InferenceOps.classifierStrata(spark, sfDir, Seq(0.0, 0.5), Seq(1, 2, 3))
    }
    // a DUPLICATED boundary would make a stratum unreachable and
    // mis-align its cap — must also be loud
    intercept[IllegalArgumentException] {
      InferenceOps.classifierStrata(spark, sfDir, Seq(0.5, 0.5), Seq(1, 2, 3))
    }
  }

  test("scores are the exact integer rational (cross-engine reproducible)") {
    // s = 3*n_tokens - n_chars + 40*stop_hits - 25; score = s/(1+|s|)
    val f = DocFeatures(1L, n_tokens = 10, n_chars = 20, stop_hits = 1)
    val Seq(s) = InferenceOps.scoreBatch(Seq(f)): @unchecked
    assert(s == DocScore(1L, 25.0 / 26.0, 1))
    val Seq(z) = InferenceOps.scoreBatch(
      Seq(DocFeatures(2L, 0, 0, 0))): @unchecked
    assert(z.score == -25.0 / 26.0 && z.keep == 0)
  }
}
