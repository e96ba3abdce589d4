package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r12 q29 rewrite: length × pigeonhole-bucket blocking must emit
  * EXACTLY the pair set of the |block|² all-pairs spelling it replaced
  * (the registered oracle hash depends on it). Three layers:
  *
  *   1. the expression itself vs a driver-side reference,
  *   2. the pigeonhole witness property on adversarial synthetic sets
  *      straddling the 0.8 threshold,
  *   3. a full differential (blocked ≡ brute force) on the real
  *      fixture AND on a hostile synthetic corpus (heavy ties, exact
  *      duplicates, short docs, one-char mutations).
  */
class Q29BlockingSpec extends SparkSpec {

  private def refBucketHashes(sh: Seq[Long], k: Int): Seq[Long] = {
    val out = new Array[Long](k)
    sh.foreach { x =>
      val b = ((graft.plans.Signatures.splitmix(x) % k).toInt + k) % k
      out(b) = out(b) * 0x9E3779B97F4A7C15L + x
    }
    out.toSeq
  }

  test("PigeonholeBucketHashes matches the driver-side reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val n = rnd.nextInt(200)
      val sh = Seq.fill(n)(rnd.nextLong()).distinct.sorted
      val k = 1 + rnd.nextInt(40)
      val got = spark.range(1)
        .select(graft.plans.PigeonholeBucketHashes.of(
          typedLit(sh), lit(k)).as("bh"))
        .head().getSeq[Long](0)
      assert(got == refBucketHashes(sh, k), s"trial $trial n=$n k=$k")
    }
  }

  test("pigeonhole witness: J >= 0.8 pairs always share a bucket") {
    // adversarial construction: base set, then remove/add d elements
    // with d swept ACROSS the threshold; for every pair that lands at
    // J >= 0.8, k = floor(2*maxc/9)+1 buckets must contain at least
    // one position with identical chain content (possibly both 0)
    val rnd = new scala.util.Random(13)
    var checkedQualifying = 0
    for (trial <- 0 until 300) {
      val m = 5 + rnd.nextInt(120)
      val a = Seq.fill(m)(rnd.nextLong()).distinct
      val d = rnd.nextInt(math.max(1, m / 3))
      val b = (a.drop(d) ++ Seq.fill(d)(rnd.nextLong())).distinct
      val inter = a.toSet.intersect(b.toSet).size
      val uni = a.size + b.size - inter
      val j = inter.toDouble / uni
      if (j >= 0.8) {
        checkedQualifying += 1
        val k = math.max(a.size, b.size) * 2 / 9 + 1
        val ha = refBucketHashes(a.sorted, k)
        val hb = refBucketHashes(b.sorted, k)
        assert(ha.zip(hb).exists { case (x, y) => x == y },
          s"trial $trial: J=$j pair with no shared bucket at k=$k")
      }
    }
    assert(checkedQualifying > 30, s"fixture too weak: $checkedQualifying qualifying pairs")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
      r.getAs[Double]("jaccard"))).toSet

  test("blocked q29 equals brute force on the testdata fixture") {
    val docs = Tables.docsWithNearDups(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        graft.plans.ShingleHashes.of(col("text")).as("shingles"))
      .localCheckpoint(false)
    val brute = pairSet(TextOps.bruteForceJaccardPairs(docs))
    val blocked = pairSet(TextOps.blockedJaccardPairs(docs))
    assert(brute.nonEmpty, "fixture produced no >= 0.8 pairs")
    assert(blocked == brute,
      s"sym-diff: ${(blocked diff brute) ++ (brute diff blocked)}")
  }

  test("blocked q29 equals brute force on a hostile synthetic corpus") {
    // heavy ties: tiny alphabet, duplicated texts, one-char mutations,
    // very short docs — the shapes that stress both the both-empty
    // bucket case and chain-hash determinism
    val rnd = new scala.util.Random(29)
    val alphabet = "abc"
    def randText(len: Int): String =
      Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val base = (0 until 120).map { i =>
      val len = 4 + rnd.nextInt(40)
      (i.toLong, randText(len))
    }
    val mutated = base.collect { case (id, t) if id % 3 == 0 =>
      val pos = rnd.nextInt(t.length)
      (id + 10000L, t.updated(pos, if (t(pos) == 'a') 'b' else 'a').toString)
    }
    val dups = base.collect { case (id, t) if id % 5 == 0 => (id + 20000L, t) }
    import spark.implicits._
    val docs = (base ++ mutated ++ dups).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
      .select(col("doc_id"), col("n_chars"),
        graft.plans.ShingleHashes.of(col("text")).as("shingles"))
      .localCheckpoint(false)
    val brute = pairSet(TextOps.bruteForceJaccardPairs(docs))
    val blocked = pairSet(TextOps.blockedJaccardPairs(docs))
    assert(brute.nonEmpty, "hostile fixture produced no >= 0.8 pairs")
    assert(blocked == brute,
      s"sym-diff: ${(blocked diff brute) ++ (brute diff blocked)}")
  }
}
