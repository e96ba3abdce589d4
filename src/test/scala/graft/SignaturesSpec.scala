package graft

import graft.plans.{MinHashSig, Signatures, SimHashSig}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class SignaturesSpec extends SparkSpec {

  test("two-level pigeonhole keys: SQL expr equals the reference, lossless at hamming <= 3") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val sigs = Seq(0L, -1L, Long.MinValue, Long.MaxValue, 0x123456789abcdefL) ++
      (1 to 50).map(_ => rnd.nextLong())
    val got = sigs.toDF("sig")
      .select(col("sig"), SimHashSig.pigeonholeChunks("sig").as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigs.foreach { s =>
      assert(got(s) == SimHashSig.pigeonholeChunksRef(s), s"sig $s")
      assert(got(s).length == 16)
      // every key carries 28 bits
      assert(got(s).forall(k => k >= 0 && k < (1L << 28)))
    }
    // losslessness: for random sigs and every <=3-bit perturbation
    // pattern sampled, the pair shares at least one (position, key)
    for (_ <- 1 to 200) {
      val a = rnd.nextLong()
      val flips = 1 + rnd.nextInt(3)
      val b = (1 to flips).foldLeft(a)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
      val ka = SimHashSig.pigeonholeChunksRef(a).zipWithIndex
      val kb = SimHashSig.pigeonholeChunksRef(b).zipWithIndex
      assert(ka.map(_.swap).toSet.intersect(kb.map(_.swap).toSet).nonEmpty,
        s"hamming<=${flips} pair shares no pigeonhole key: $a vs $b")
    }
  }

  test("simhash expression equals the direct computation and is stable") {
    import spark.implicits._
    val texts = Seq("the quick brown fox", "the quick brown fox", "a b c", "one")
    val got = texts.toDF("text")
      .select(SimHashSig.of(col("text")).as("sig"))
      .collect().map(_.getLong(0))
    val want = texts.map(t => Signatures.simhash(UTF8String.fromString(t)))
    assert(got.toSeq == want)
    assert(got(0) == got(1), "identical text => identical signature")
    assert(got(0) != got(2))
  }

  test("minhash expression: near-identical texts share most of the signature") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog many many times today"
    val b = "Zhe quick brown fox jumps over the lazy dog many many times today"
    val sigs = Seq(a, b).toDF("text")
      .select(MinHashSig.of(col("text"), 48).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val same = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    assert(same >= 40, s"expected near-dup texts to agree on most minhashes, got $same/48")
    assert(sigs(0).length == 48 && sigs(0).distinct.length > 20)
  }

  test("expressions are registered for SQL and codegen'd (no fallback)") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT simhash_sig('a b c') AS s, minhash_sig('abcdef', 8) AS m")
      .collect().head
    assert(viaSql.getLong(0) == Signatures.simhash(UTF8String.fromString("a b c")))
    assert(viaSql.getSeq[Long](1).length == 8)
    // the full custom-expression surface is SQL-reachable
    val more = spark.sql(
      "SELECT gram_hashes('abcdefgh', 8) AS g, " +
        "sorted_intersect_count(array(1L, 3L, 5L), array(3L, 5L, 7L)) AS i, " +
        "compression_ratio('aaaaaaaaaaaaaaaa') AS c, " +
        "etld1('sub.example.co.uk') AS e").collect().head
    assert(more.getSeq[Long](0).nonEmpty)
    assert(more.getInt(1) == 2)
    assert(more.getDouble(2) > 0.0)
    assert(more.getString(3) == "example.co.uk")
    // the generated Java must call straight into the static helpers —
    // proof the expression codegens instead of interpreted fallback
    val code = org.apache.spark.sql.execution.debug.codegenString(
      Tables.table(spark, sfDir, "documents")
        .select(SimHashSig.of(col("text")), MinHashSig.of(col("text")))
        .queryExecution.executedPlan)
    assert(code.contains("Signatures.simhash"), "simhash not in generated code")
    assert(code.contains("Signatures.minhash"), "minhash not in generated code")
  }

  test("minhash_agg is a mergeable union sketch (associativity + identity)") {
    import spark.implicits._
    import graft.plans.MinHashAgg
    val docs = Seq((0, "aaa bbb ccc"), (0, "ddd eee fff"), (1, "aaa bbb ccc")).toDF("g", "t")
    // group 1's single-element sketch == that element's permutation vector
    val g1 = docs.filter(col("g") === 1)
      .agg(MinHashAgg.of(col("t"), 16)).collect().head.getSeq[Long](0)
    val direct = Signatures.elementMinhash(UTF8String.fromString("aaa bbb ccc"), 16)
    assert(g1 == direct.toSeq)
    // group 0's union sketch == elementwise min of its elements' vectors
    val rows = Seq("aaa bbb ccc", "ddd eee fff")
      .map(t => Signatures.elementMinhash(UTF8String.fromString(t), 16))
    val expectedUnion = rows(0).zip(rows(1)).map { case (a, b) => math.min(a, b) }
    val g0 = docs.filter(col("g") === 0)
      .agg(MinHashAgg.of(col("t"), 16)).collect().head.getSeq[Long](0)
    assert(g0 == expectedUnion.toSeq)
    // and over a repartitioned input (forces partial/merge path)
    val g0r = docs.filter(col("g") === 0).repartition(4)
      .agg(MinHashAgg.of(col("t"), 16)).collect().head.getSeq[Long](0)
    assert(g0r == expectedUnion.toSeq)
    // SQL registration
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql("SELECT minhash_agg(t, 16) FROM mh_docs WHERE g = 0")
      .collect().head.getSeq[Long](0)
    assert(viaSql == expectedUnion.toSeq)
  }

  test("compression_ratio orders repetitive below diverse text and codegens") {
    import spark.implicits._
    import graft.plans.CompressionRatio
    val repetitive = "spam spam spam spam " * 50
    val diverse = (1 to 200).map(i => Signatures.splitmix(i).toHexString).mkString(" ")
    val rows = Seq(("rep", repetitive), ("div", diverse)).toDF("k", "text")
      .select(col("k"), CompressionRatio.of(col("text")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("rep") < 0.1, s"repetitive text should deflate hard: ${rows("rep")}")
    assert(rows("div") > rows("rep") * 3, s"diverse text must compress far less: $rows")
    val code = org.apache.spark.sql.execution.debug.codegenString(
      Tables.table(spark, sfDir, "documents")
        .select(CompressionRatio.of(col("text")))
        .queryExecution.executedPlan)
    assert(code.contains("Signatures.compressionRatio"), "must codegen, not fall back")
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT compression_ratio('aaaa aaaa aaaa aaaa aaaa aaaa')")
      .head().getDouble(0)
    assert(viaSql > 0 && viaSql < 1)
  }

  test("null and empty inputs are safe") {
    import spark.implicits._
    val rows = Seq(Some("abc"), Some(""), None).toDF("text")
      .select(SimHashSig.of(col("text")).as("s"), MinHashSig.of(col("text"), 4).as("m"))
      .collect()
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
    assert(!rows(1).isNullAt(0))
  }

  test("sorted_intersect_count equals array_intersect on sorted distinct arrays") {
    import spark.implicits._
    import graft.plans.{GramHashes, SortedIntersectCount}
    // random-ish text pairs through the REAL producer (GramHashes emits
    // sorted distinct arrays — the expression's input contract)
    val texts = (0 until 50).map(i =>
      (s"the quick ${i % 7} fox jumps over ${i % 3} dogs " * (1 + i % 4),
        s"the quick ${(i + 1) % 7} fox leaps over ${i % 3} dogs " * (1 + i % 5)))
    val df = texts.toDF("a", "b").select(
      GramHashes.of(col("a"), 3).as("ah"), GramHashes.of(col("b"), 3).as("bh"))
    val got = df.select(
      SortedIntersectCount.of(col("ah"), col("bh")).as("fast"),
      size(array_intersect(col("ah"), col("bh"))).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    assert(got.exists(_.getInt(0) > 0), "fixture must produce real overlaps")
    // empty side and identical side
    val edge = Seq(("", "abc"), ("abc", "abc")).toDF("a", "b").select(
      SortedIntersectCount.of(GramHashes.of(col("a"), 3), GramHashes.of(col("b"), 3)).as("n"))
      .collect().map(_.getInt(0))
    assert(edge(1) == 1, "identical 3-char texts share their single gram")
  }

  test("jaccard sketch bound is conservative: pass=false proves J < 0.8") {
    // the screen may only drop pairs exact verification would reject —
    // check on random set pairs swept across the threshold, including
    // saturation regimes (sets far larger than the 4-bit counters)
    def sketch(xs: Seq[Long], k: Int) = Signatures.jaccardSketch(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(xs.toArray), k)
    val rnd = new scala.util.Random(31)
    var dropped = 0
    var qualifying = 0
    for (trial <- 0 until 2000) {
      // three size regimes: tiny, fixture-like, saturating (n >> 15*256)
      val m = Seq(1 + rnd.nextInt(6), 30 + rnd.nextInt(300),
        8000 + rnd.nextInt(4000))(trial % 3)
      val a = Seq.fill(m)(rnd.nextLong()).distinct
      val d = rnd.nextInt(math.max(1, m / 3))
      val b = (a.drop(d) ++ Seq.fill(d)(rnd.nextLong())).distinct
      val inter = a.toSet.intersect(b.toSet).size
      val qualifies = 9L * inter >= 4L * (a.size + b.size) // J >= 0.8 exactly
      for (k <- Seq(64, 256)) { // both deployed bucket counts
        val pass = Signatures.jaccardSketchPass(sketch(a, k), sketch(b, k))
        if (qualifies) {
          qualifying += 1
          assert(pass, s"trial $trial k=$k: qualifying pair dropped " +
            s"(|A|=${a.size} |B|=${b.size} I=$inter)")
        }
        if (!pass) dropped += 1
      }
    }
    assert(qualifying > 300, s"fixture too weak: $qualifying qualifying pairs")
    assert(dropped > 300, s"screen never fires: $dropped dropped")
    // mixed widths (k=64 key sketch vs k=256 join sketch) would read
    // b's totals from the wrong offset and silently drop qualifying
    // pairs — the compare must fail loudly instead
    val xs = Seq.fill(50)(rnd.nextLong()).distinct
    intercept[IllegalArgumentException] {
      Signatures.jaccardSketchPass(sketch(xs, 64), sketch(xs, 256))
    }
  }

  test("jaccard sketch expression equals the driver-side computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val texts = Seq("", "abc", "abcabcabc") ++
      (1 to 20).map(_ => Seq.fill(5 + rnd.nextInt(200))(
        ('a' + rnd.nextInt(4)).toChar).mkString)
    val got = texts.toDF("text").select(
      graft.plans.JaccardSketchExpr.of(graft.plans.ShingleHashes.of(col("text")))
        .as("sk")).collect().map(_.getAs[Array[Byte]](0))
    texts.zip(got).foreach { case (t, sk) =>
      val sh = Signatures.shingleHashes(UTF8String.fromString(t))
      val want = Signatures.jaccardSketch(sh, Signatures.JaccardSketchK)
      assert(java.util.Arrays.equals(sk, want), s"text '$t'")
      // self-pass: any set passes against itself (J = 1)
      assert(Signatures.jaccardSketchPass(sk, sk), s"self-pass '$t'")
    }
  }
}
