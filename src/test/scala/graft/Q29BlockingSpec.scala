package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q29 blocking (r14: PPJoin/AllPairs prefix filtering — replaced
  * the r12 pigeonhole bucketing) must emit EXACTLY the pair set of the
  * |block|² all-pairs spelling (the registered oracle hash depends on
  * it). Three layers:
  *
  *   1. the expression itself vs a driver-side reference,
  *   2. the prefix witness property on adversarial synthetic sets
  *      straddling the 0.8 threshold,
  *   3. a full differential (blocked ≡ brute force) on the real
  *      fixture AND on a hostile synthetic corpus (heavy ties, exact
  *      duplicates, short docs, one-char mutations).
  */
class Q29BlockingSpec extends SparkSpec {

  /** Driver-side reference of [[graft.plans.Signatures.prefixShingles]]:
    * p = n − ⌈0.8n⌉ + 1 tokens, rare (non-common) ascending first,
    * then common ascending.
    */
  private def refPrefix(sh: Seq[Long], common: Set[Long]): Seq[Long] = {
    val n = sh.size
    if (n == 0) return Seq.empty
    val p = n - (4 * n + 4) / 5 + 1
    val sorted = sh.sorted
    (sorted.filterNot(common) ++ sorted.filter(common)).take(p)
  }

  test("PrefixShingles matches the driver-side reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val n = rnd.nextInt(200)
      val sh = Seq.fill(n)(rnd.nextLong()).distinct.sorted
      val common = sh.filter(_ => rnd.nextBoolean()).take(rnd.nextInt(20)).toArray
      val got = spark.range(1)
        .select(graft.plans.PrefixShingles.of(typedLit(sh), common).as("p"))
        .head().getSeq[Long](0)
      assert(got == refPrefix(sh, common.toSet), s"trial $trial n=$n")
    }
  }

  test("prefix witness: J >= 0.8 pairs share a token in both prefixes") {
    // adversarial construction: base set, then remove/add d elements
    // with d swept ACROSS the threshold; for every pair that lands at
    // J >= 0.8, the two prefixes must share at least one token —
    // under an EMPTY common set and under a common set that
    // adversarially includes most of the intersection (the order
    // choice must never break the witness, only shift it)
    val rnd = new scala.util.Random(13)
    var checkedQualifying = 0
    for (trial <- 0 until 300) {
      val m = 5 + rnd.nextInt(120)
      val a = Seq.fill(m)(rnd.nextLong()).distinct
      val d = rnd.nextInt(math.max(1, m / 3))
      val b = (a.drop(d) ++ Seq.fill(d)(rnd.nextLong())).distinct
      val inter = a.toSet.intersect(b.toSet)
      val uni = a.size + b.size - inter.size
      val j = inter.size.toDouble / uni
      if (j >= 0.8) {
        checkedQualifying += 1
        for (common <- Seq(Set.empty[Long],
            inter.filter(_ => rnd.nextBoolean()),
            inter)) {
          val pa = refPrefix(a, common).toSet
          val pb = refPrefix(b, common).toSet
          assert(pa.intersect(pb).nonEmpty,
            s"trial $trial: J=$j pair with disjoint prefixes (|common|=${common.size})")
        }
      }
    }
    assert(checkedQualifying > 30, s"fixture too weak: $checkedQualifying qualifying pairs")
  }

  test("positional screen: the min-common-token witness always passes the bound") {
    // the r15 candidate join drops a layer-1 match at prefix-order
    // positions (i, j) unless 9·(1 + min(|A|−i−1, |B|−j−1)) ≥
    // 4·(|A|+|B|). Losslessness rests on ONE claim: for every J ≥ 0.8
    // pair, the emission of its MINIMUM common token under the
    // (isCommon, token) order satisfies the bound — every common
    // token sorts at-or-after it in both docs, so the overlap is
    // capped by the suffix lengths at its positions. Check the claim
    // directly on adversarial near-threshold pairs, under an empty
    // common set and under ones overlapping the intersection (the
    // order choice shifts the witness, never breaks it).
    val rnd = new scala.util.Random(41)
    var checkedQualifying = 0
    for (trial <- 0 until 400) {
      val m = 2 + rnd.nextInt(120) // include tiny sets: integer edges
      val a = Seq.fill(m)(rnd.nextLong()).distinct
      val d = rnd.nextInt(math.max(1, m / 3))
      val b = (a.drop(d) ++ Seq.fill(d)(rnd.nextLong())).distinct
      val inter = a.toSet.intersect(b.toSet)
      val j = inter.size.toDouble / (a.size + b.size - inter.size)
      if (j >= 0.8 && inter.nonEmpty) {
        checkedQualifying += 1
        for (common <- Seq(Set.empty[Long],
            inter.filter(_ => rnd.nextBoolean()),
            inter ++ a.filter(_ => rnd.nextBoolean()))) {
          // full O-order of each doc (rare ascending, then common
          // ascending) — positions are indices in THIS order, which
          // is what the transform index in prefixKeys equals for
          // every emitted prefix token
          def oOrder(s: Seq[Long]) = {
            val srt = s.sorted
            srt.filterNot(common) ++ srt.filter(common)
          }
          val oa = oOrder(a); val ob = oOrder(b)
          val witness = inter.minBy(t => (common(t), t))
          val i = oa.indexOf(witness); val jj = ob.indexOf(witness)
          assert(9L * (1 + math.min(a.size - i - 1, b.size - jj - 1)) >=
            4L * (a.size + b.size),
            s"trial $trial: qualifying pair's witness fails the bound " +
              s"(J=$j |A|=${a.size} |B|=${b.size} i=$i j=$jj)")
        }
      }
    }
    assert(checkedQualifying > 40, s"fixture too weak: $checkedQualifying")
  }

  test("blocked q29 equals brute force across random corpora (multi-seed)") {
    // five seeds × varying alphabet/length regimes, including 2-char
    // alphabets and 3-8 char docs (1-6 shingles) where the screen's
    // integer arithmetic sits exactly on its boundaries
    import spark.implicits._
    for (seed <- Seq(101, 202, 303, 404, 505)) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "ab" + "cdefg".take(rnd.nextInt(4))
      def randText(len: Int): String =
        Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val base = (0 until 80).map { i =>
        (i.toLong, randText(3 + rnd.nextInt(30)))
      }
      val mutated = base.collect { case (id, t) if id % 2 == 0 =>
        val pos = rnd.nextInt(t.length)
        (id + 1000L, t.updated(pos, if (t(pos) == 'a') 'b' else 'a').toString)
      }
      val docs = (base ++ mutated).toDF("doc_id", "text")
        .withColumn("n_chars", length(col("text")))
        .select(col("doc_id"), col("n_chars"), col("text"))
      val brute = pairSet(TextOps.bruteForceJaccardPairs(docs))
      val blocked = pairSet(TextOps.blockedJaccardPairs(docs))
      assert(blocked == brute,
        s"seed $seed sym-diff: ${(blocked diff brute) ++ (brute diff blocked)}")
    }
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
      r.getAs[Double]("jaccard"))).toSet

  test("blocked q29 equals brute force on the testdata fixture") {
    val docs = Tables.docsWithNearDups(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), col("text"))
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
      .select(col("doc_id"), col("n_chars"), col("text"))
    val brute = pairSet(TextOps.bruteForceJaccardPairs(docs))
    val blocked = pairSet(TextOps.blockedJaccardPairs(docs))
    assert(brute.nonEmpty, "hostile fixture produced no >= 0.8 pairs")
    assert(blocked == brute,
      s"sym-diff: ${(blocked diff brute) ++ (brute diff blocked)}")
  }
}
