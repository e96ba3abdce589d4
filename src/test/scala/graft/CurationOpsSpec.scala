package graft

import graft.operators.CurationOps
import org.apache.spark.sql.functions._

class CurationOpsSpec extends SparkSpec {

  test("q76 DSIR overselects the target sources and scores deterministically") {
    val sel = CurationOps.q76_dsir.run(spark, sfDir).collect()
    assert(sel.length <= 100 && sel.nonEmpty)
    // the point of importance resampling: target-looking docs come out
    // overrepresented vs their 2-in-20 base rate
    val targetShare = sel.count(r =>
      Set("src0", "src1")(r.getAs[String]("source"))).toDouble / sel.length
    assert(targetShare > 0.1,
      s"target share $targetShare not above the 0.1 base rate")
    // scores are sorted desc with doc_id tie-break, n_feats positive
    val scores = sel.map(r => (r.getAs[Double]("dsir_logw"), r.getAs[Long]("doc_id")))
    assert(scores.sameElements(scores.sortBy(t => (-t._1, t._2))))
    sel.foreach(r => assert(r.getAs[Int]("n_feats") > 0))
    val again = CurationOps.q76_dsir.run(spark, sfDir).collect()
    assert(sel.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q76 feature count is unigrams + bigrams of the token stream") {
    val d = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("n_tok"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_tok")).toMap
    CurationOps.q76_dsir.run(spark, sfDir).collect().foreach { r =>
      val nt = d(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("n_feats") == 2 * nt - 1,
        s"doc ${r.get(0)}: ${r.getAs[Int]("n_feats")} feats for $nt tokens")
    }
  }

  test("q77 removes every duplicated line except its first occurrence") {
    val out = CurationOps.q77_line_dedup.run(spark, sfDir).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    assert(out.length == nDocs + (nDocs + Tables.DupEvery - 1) / Tables.DupEvery)
    out.foreach { r =>
      val (nl, nk) = (r.getAs[Int]("n_lines"), r.getAs[Int]("n_kept"))
      assert(nk >= 0 && nk <= nl && nl > 0)
      assert((nk == 0) == (r.getAs[String]("kept_md5") == null))
    }
    // each planted Z-variant shares every line but its first with its
    // (lower-id) original, so it keeps AT MOST its one modified line —
    // and 0 only when that line itself repeats an earlier variant's
    // (the fixture's docs 0 and 50 share their opening tokens)
    val variants = out.filter(_.getAs[Long]("doc_id") >= Tables.NearDupOffset)
    assert(variants.nonEmpty)
    variants.foreach { r =>
      assert(r.getAs[Int]("n_kept") <= 1,
        s"variant ${r.get(0)} kept ${r.getAs[Int]("n_kept")} lines")
      val orig = byId(r.getAs[Long]("doc_id") - Tables.NearDupOffset)
      assert(r.getAs[Int]("n_lines") == orig.getAs[Int]("n_lines"))
    }
    // the FIRST variant's z-line is globally first among z-lines: kept
    assert(byId(Tables.NearDupOffset).getAs[Int]("n_kept") == 1)
    // corpus-level: dedup removed something (the variants' dup lines)
    val totLines = out.map(_.getAs[Int]("n_lines")).sum
    val totKept = out.map(_.getAs[Int]("n_kept")).sum
    assert(totKept < totLines)
  }

  test("q77 rebuilt text of an untouched doc is its normalized token stream") {
    // a doc whose lines are all kept reassembles to exactly
    // array_join(tokens, ' ') — pin that md5 equality for one such doc
    val out = CurationOps.q77_line_dedup.run(spark, sfDir)
      .filter(col("n_kept") === col("n_lines"))
      .limit(1).collect()
    assert(out.nonEmpty, "no fully-kept doc in fixture")
    val id = out(0).getAs[Long]("doc_id")
    val expect = Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") === id)
      .select(md5(concat_ws(" ",
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))).as("m"))
      .head().getAs[String]("m")
    assert(out(0).getAs[String]("kept_md5") == expect)
  }
}
