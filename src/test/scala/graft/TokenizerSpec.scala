package graft

import graft.operators.TokenizerOps
import org.apache.spark.sql.functions._

class TokenizerSpec extends SparkSpec {

  /** Independent single-node BPE (Sennrich et al. 2016 alg. 1) over a
    * word-frequency dict, same tie-break (count desc, pair lex asc).
    */
  private def referenceBpe(freq: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    // distinct words concat-reconstruct uniquely, so the Map key stays unique
    var vocab: Map[Vector[String], Long] =
      freq.map { case (w, c) => w.split("").toVector -> c }
    val out = collection.mutable.Buffer[(Int, String, String, Long)]()
    var step = 0
    while (step < k) {
      val counts = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).foreach(p => counts((p(0), p(1))) += c)
      }
      if (counts.isEmpty) return out.toSeq
      val ((l, r), c) = counts.toSeq.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
      step += 1
      out += ((step, l, r, c))
      vocab = vocab.map { case (syms, cnt) =>
        val m = collection.mutable.Buffer[String]()
        syms.foreach { x =>
          if (m.nonEmpty && m.last == l && x == r) m(m.size - 1) = l + r
          else m += x
        }
        m.toVector -> cnt
      }
    }
    out.toSeq
  }

  test("q71 BPE merge sequence equals an independent reference fit") {
    val rows = TokenizerOps.q71_bpe_train.run(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TokenizerOps.BpeMerges)
    // merged is always the concat of its parts
    rows.foreach(r => assert(
      r.getAs[String]("merged") == r.getAs[String]("left") + r.getAs[String]("right")))
    val got = rows.map(r => (r.getAs[Int]("step"), r.getAs[String]("left"),
      r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSeq
    val freq = Tables.table(spark, sfDir, "documents")
      .select(explode(split(col("text"), " +")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = referenceBpe(freq, TokenizerOps.BpeMerges)
    assert(got == ref, s"merge sequences diverge:\n got=$got\n ref=$ref")
    // the fit is deterministic across runs
    val again = TokenizerOps.q71_bpe_train.run(spark, sfDir).collect()
      .map(_.toString).toSeq
    assert(again == rows.map(_.toString).toSeq)
  }

  /** Reference encode: iterate the learned merges until fixpoint (the
    * textbook formulation — deliberately NOT the shipped sequential
    * fold, so the spec proves the fold equivalence, not echoes it).
    */
  private def referenceEncode(word: String, merges: Seq[(String, String)]): Vector[String] = {
    val ranks = merges.zipWithIndex.toMap
    var syms = word.split("").toVector
    var done = false
    while (!done) {
      val present = syms.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).filter(ranks.contains).toSeq
      if (present.isEmpty) done = true
      else {
        val (l, r) = present.minBy(ranks)
        val m = collection.mutable.Buffer[String]()
        syms.foreach { x =>
          if (m.nonEmpty && m.last == l && x == r) m(m.size - 1) = l + r
          else m += x
        }
        syms = m.toVector
      }
    }
    syms
  }

  test("q75 encode equals fixpoint reference BPE on every document") {
    val rows = TokenizerOps.q75_bpe_encode.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val freq = Tables.table(spark, sfDir, "documents")
      .select(explode(split(col("text"), " +")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = referenceBpe(freq, TokenizerOps.BpeMerges)
      .map { case (_, l, r, _) => (l, r) }
    val nTok: Map[String, Int] = freq.keys.map(w => w -> referenceEncode(w, merges).size).toMap
    val expected = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val ws = r.getString(1).split(" +").filter(_.nonEmpty)
        r.getLong(0) -> ((ws.length.toLong, ws.map(nTok).sum.toLong, ws.map(nTok).max))
      }.toMap
    assert(rows.length == expected.size, "one row per document")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val got = (r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"),
        r.getAs[Int]("max_word_tokens"))
      assert(got == expected(id), s"doc $id: got $got expected ${expected(id)}")
    }
    // compression sanity: merges only ever shrink the symbol stream
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
    }
  }
}
