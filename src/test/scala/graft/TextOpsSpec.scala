package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("q26 regex tokenization counts words, numbers and punct runs") {
    val rows = TextOps.q26_token_count.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_bpe_tokens") >= r.getAs[Long]("total_tokens") - r.getAs[Long]("n_docs"),
        "regex tokens should not undercount vs whitespace tokens")
    }
  }

  test("q36 clusters every injected near-dup pair under one label") {
    val clusters = TextOps.q36_dup_clusters.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val injected = Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 25 === 0).select("doc_id").collect().map(_.getLong(0))
    assert(injected.nonEmpty)
    injected.foreach { id =>
      assert(clusters.contains(id) && clusters.contains(id + Tables.NearDupOffset))
      assert(clusters(id) == clusters(id + Tables.NearDupOffset),
        s"doc $id and its near-dup must share a cluster")
      assert(clusters(id) <= id, "cluster id is the component minimum")
    }
  }

  test("q74 keep decision: one kept doc per cluster, singletons kept, universe covered") {
    val rows = TextOps.q74_dedup_keep.run(spark, sfDir).collect()
    val universe = Tables.docsWithNearDups(spark, sfDir, spread = false).count()
    assert(rows.length == universe, "every document gets exactly one decision")
    val byCanon = rows.groupBy(_.getAs[Long]("canonical_id"))
    byCanon.foreach { case (canon, members) =>
      val kept = members.filter(_.getAs[Int]("kept") == 1)
      assert(kept.length == 1, s"cluster $canon keeps exactly one doc")
      assert(kept.head.getAs[Long]("doc_id") == canon,
        "the kept doc IS the canonical (minimum) id")
      assert(members.forall(_.getAs[Long]("doc_id") >= canon))
    }
    // the planted near-dups are exactly the dropped docs: original kept
    val decisions = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("kept")).toMap
    Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % Tables.DupEvery === 0)
      .select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      assert(decisions(id) == 1, s"original $id survives")
      assert(decisions(id + Tables.NearDupOffset) == 0, s"planted variant of $id is dropped")
    }
  }

  test("q44 winnowing guarantee: docs sharing a long substring share a fingerprint") {
    import spark.implicits._
    val shared = "the winnowing guarantee substring here"
    val docs = Seq(
      (1L, s"prefix one $shared and a tail"),
      (2L, s"totally different beginning $shared other ending"),
      (3L, "no overlap with the others at all in this text")).toDF("doc_id", "text")
    // the SHIPPED expressions, not a copy — edits to q44 are re-tested here
    def fps(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("hs", expr(TextOps.winnowHashExpr))
      .withColumn("fps", array_distinct(expr(TextOps.winnowFpExpr)))
      .select(col("doc_id"), col("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val m = fps(docs)
    assert((m(1L) intersect m(2L)).nonEmpty,
      "a shared substring of length >= w+k-1 must yield a shared fingerprint")
    assert((m(1L) intersect m(3L)).size < m(1L).size / 2,
      "unrelated docs should share few fingerprints")
  }

  test("q49 histogram is frequency-ordered and counts a planted corpus exactly") {
    import spark.implicits._
    val rows = TextOps.q49_token_histogram.run(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val freqs = rows.map(_.getAs[Long]("freq")).toSeq
    assert(freqs == freqs.sorted.reverse, "must be descending by frequency")
    // tokenization exactness on a planted two-doc corpus
    val planted = Seq((1L, "The cat and the dog"), (2L, "a cat!")).toDF("doc_id", "text")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("token"))
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(planted == Map("the" -> 2L, "cat" -> 2L, "and" -> 1L, "dog" -> 1L, "a" -> 1L))
  }

  test("q50 inverted index: rare band respected and postings agree with df") {
    val rows = TextOps.q50_inverted_index.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    // segments of one term reassemble (in seg order) to the full
    // sorted posting list of length df; each segment stays inside its
    // doc-id range (the structural buffer bound)
    rows.groupBy(r => (r.getAs[String]("token"), r.getAs[Long]("df"))).foreach {
      case ((_, df), segs) =>
        assert(df * 20 <= nDocs, "only rare terms may carry postings")
        val ids = segs.sortBy(_.getAs[Long]("seg")).flatMap { r =>
          val seg = r.getAs[Long]("seg")
          val segIds = r.getAs[String]("postings").split(",").map(_.toLong).toSeq
          assert(segIds.forall(id => id / TextOps.PostingSegWidth == seg),
            "posting outside its segment range")
          segIds
        }.toSeq
        assert(ids.length == df.toInt, "reassembled postings must equal df")
        assert(ids == ids.sorted && ids.distinct == ids, "postings sorted and unique")
    }
    // at least one term actually spans multiple segments at this SF —
    // otherwise the segmentation is untested
    assert(rows.groupBy(_.getAs[String]("token")).exists(_._2.length > 1))
  }

  test("q81 flags a doc past the 20% 13-gram overlap fraction, not below it") {
    import spark.implicits._
    def words(tag: String, n: Int) =
      (0 until n).map(i => tag + ('a' + i % 26).toChar.toString + ('a' + i / 26).toChar.toString)
    val evalWords = words("ev", 30)
    val evalDf = Seq((7L, evalWords.mkString(" "))).toDF("doc_id", "text")
    // A: 40 tokens, a 20-token verbatim eval span → 8 of 28 distinct
    // grams shared (28.6% > 20%) → flagged
    val aText = (words("aa", 20) ++ evalWords.take(20)).mkString(" ")
    // B: shares only a 5-token run — below the gram width, zero shared
    val bText = (words("bb", 30) ++ evalWords.take(5)).mkString(" ")
    // C: 10 tokens — too short to produce any gram, never flagged
    val cText = words("cc", 10).mkString(" ")
    val train = Seq((1L, aText), (2L, bText), (3L, cText)).toDF("doc_id", "text")
    val out = TextOps.contaminationRate(train, evalDf)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
          r.getAs[Int]("contaminated"))).toMap
    assert(out(1L) == ((28L, 8L, 1)), s"A: ${out(1L)}")
    assert(out(2L) == ((23L, 0L, 0)), s"B: ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0)), s"C: ${out(3L)}")
    // the registered query runs the same rule over the corpus: every
    // flag must satisfy the integer threshold, eval docs excluded
    val reg = TextOps.q81_contamination_rate.run(spark, sfDir).collect()
    assert(reg.nonEmpty)
    reg.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 != 7)
      val (g, s, c) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
        r.getAs[Int]("contaminated"))
      assert(s <= g)
      assert(c == (if (100 * s > 20 * g) 1 else 0))
    }
  }

  test("q81 differential fuzz: agrees with a driver-side reference contamination rate") {
    import spark.implicits._
    val G = 13
    def gramsOf(tx: String): Set[String] =
      "[a-z]+".r.findAllIn(tx.toLowerCase).toVector.sliding(G)
        .filter(_.size == G).map(_.mkString(" ")).toSet
    val rnd = new scala.util.Random(23)
    // a tiny vocabulary makes 13-gram collisions common (stressing the
    // row-local distinct) and some docs fall under one gram wide
    val vocab = Vector("ox", "ant", "bee", "cat", "dog")
    for (trial <- 1 to 4) {
      val docs = (1L to (30 + rnd.nextInt(30)).toLong).map { id =>
        (id, Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val (evalDocs, train) = docs.partition(_._1 % 5 == 0)
      val evalGrams = evalDocs.flatMap(d => gramsOf(d._2)).toSet
      val expect = train.map { case (id, tx) =>
        val g = gramsOf(tx)
        val shared = g.count(evalGrams)
        id -> ((g.size.toLong, shared.toLong,
          if (100 * shared > 20 * g.size) 1 else 0))
      }.toMap
      val out = TextOps.contaminationRate(
        train.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_shared"),
            r.getAs[Int]("contaminated")))).toMap
      assert(out == expect, s"trial $trial diverged from the reference")
    }
  }

  test("q53 decontamination flags every train doc sharing an 8-gram with eval") {
    val rows = TextOps.q53_decontaminate.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // no eval doc may appear on the train side of the report
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 != 7)
      assert(r.getAs[Long]("n_eval_docs") >= 1)
      assert(r.getAs[Long]("n_shared_grams") >= 1)
    }
    // a doc sharing an 8-gram with an eval doc must be flagged: doc 7
    // is eval (7 % 50 = 7); any train doc with a common substring of
    // length >= 8 against it shows up
    val evalTexts = Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 50 === 7).select("text").collect().map(_.getString(0))
    val flagged = rows.map(_.getAs[Long]("doc_id")).toSet
    val sample = Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 50 =!= 7).select("doc_id", "text").collect()
      .find { r =>
        val t = r.getString(1)
        evalTexts.exists(e => (0 to t.length - 8).exists(i => e.contains(t.substring(i, i + 8))))
      }
    sample.foreach(r => assert(flagged.contains(r.getLong(0))))
  }

  test("q36 labels are component minima (idempotent under re-propagation)") {
    val df = TextOps.q36_dup_clusters.run(spark, sfDir)
    // every cluster_id must itself be a member of the cluster
    val ids = df.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val labels = df.select(col("cluster_id")).collect().map(_.getLong(0)).toSet
    assert(labels.subsetOf(ids))
  }

  test("q55 packing conserves tokens and chunks start where cum crosses 2048") {
    val packed = TextOps.q55_pack_sequences.run(spark, sfDir).collect()
    assert(packed.nonEmpty)
    // token conservation: chunk sums over each source == corpus sum
    val bySource = packed.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("chunk_tokens")).sum).toMap
    val expected = Tables.table(spark, sfDir, "documents")
      .groupBy(col("source"))
      .agg(sum(length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .as("t"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("t")).toMap
    assert(bySource == expected, "every token lands in exactly one chunk")
    val maxDoc = Tables.table(spark, sfDir, "documents")
      .agg(max(length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .cast("bigint"))
      .head().getLong(0)
    // chunk ids are dense from 0 within each source — valid whenever no
    // single doc spans a whole chunk (then every boundary is crossed
    // by a doc that STARTS in the preceding chunk)
    if (maxDoc < 2048)
      packed.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
        val chunks = rows.map(_.getAs[Long]("chunk")).sorted
        assert(chunks.head == 0L, s"$src must start at chunk 0")
        assert(chunks.toSeq == (0L until chunks.length).toSeq, s"$src chunks not dense")
      }
    // sanity: no chunk claims more tokens than C + one max-length doc
    packed.foreach(r =>
      assert(r.getAs[Long]("chunk_tokens") <= 2048 + maxDoc,
        s"chunk overfilled: ${r}"))
  }

  test("q62 scrubs exactly the planted PII and leaves clean docs byte-identical") {
    import org.apache.spark.sql.functions.md5
    val out = graft.operators.TextOps.q62_pii_scrub.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val rawMd5 = Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("h")).toMap
    assert(out.nonEmpty && out.keySet == rawMd5.keySet)
    out.foreach { case (id, r) =>
      if (id % 10 == 0) {
        // one planted email, ip and phone each — all found and rewritten
        assert(r.getAs[Int]("n_emails") == 1 && r.getAs[Int]("n_ips") == 1 &&
          r.getAs[Int]("n_phones") == 1, s"doc $id: $r")
        assert(r.getAs[String]("redacted_md5") != rawMd5(id))
      } else {
        // the corpus has no organic PII; a clean doc must pass through
        // BYTE-IDENTICAL (no accidental rewrites)
        assert(r.getAs[Int]("n_emails") == 0 && r.getAs[Int]("n_ips") == 0 &&
          r.getAs[Int]("n_phones") == 0, s"doc $id: $r")
        assert(r.getAs[String]("redacted_md5") == rawMd5(id))
      }
    }
  }

  test("q65 source mix: quotas sum to the target and follow sqrt weights") {
    val out = graft.operators.TextOps.q65_source_mix.run(spark, sfDir).collect()
    val byz = out.groupBy(_.getAs[String]("source"))
    // total drawn = exactly the target (largest-remainder exactness)
    assert(out.length == graft.operators.TextOps.MixTarget)
    byz.foreach { case (src, rows) =>
      val quota = rows.head.getAs[Int]("quota")
      assert(rows.forall(_.getAs[Int]("quota") == quota))
      assert(rows.length == quota, s"$src drew ${rows.length} != quota $quota")
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rows.length))
    }
    // allocation matches an independent largest-remainder recompute
    val counts = Tables.table(spark, sfDir, "documents")
      .groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val sw = counts.map { case (s, n) =>
      s -> BigDecimal(math.sqrt(n.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP) }
    val tsw = sw.values.sum.toDouble
    val ideal = sw.map { case (s, v) =>
      s -> graft.operators.TextOps.MixTarget.toDouble * v.toDouble / tsw }
    val base = ideal.map { case (s, v) => s -> v.floor.toInt }
    val k = graft.operators.TextOps.MixTarget - base.values.sum
    val topUp = ideal.toSeq.map { case (s, v) => (s, v - v.floor) }
      .sortBy { case (s, f) => (-f, s) }.take(k).map(_._1).toSet
    val want = base.map { case (s, b) => s -> (b + (if (topUp(s)) 1 else 0)) }
    assert(byz.keySet == want.filter(_._2 > 0).keySet)
    byz.foreach { case (s, rows) => assert(rows.length == want(s), s"quota for $s") }
  }

  test("q66 finds exactly the planted shared-substring pairs with high overlap") {
    import graft.operators.TextOps
    val out = TextOps.q66_substring_dup.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("n_windows")))
    // the planted +NearDupOffset variants differ from their base only in the
    // first character, so every window past the first token is shared
    val want = Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 25 === 0).select("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(0) + Tables.NearDupOffset)).toSet
    assert(out.nonEmpty)
    // every planted couple is found; the corpus ALSO contains organic
    // repeated spans (the generator reuses word runs), which is the
    // operator's purpose — so subset, not equality
    val found = out.map(t => (t._1, t._2)).toSet
    assert(want.subsetOf(found), s"missing planted pairs: ${want -- found}")
    out.filter(t => want((t._1, t._2))).foreach { case (a, b, n) =>
      // planted overlap ≈ all windows: tokens - W + 1 minus the W
      // windows touching the changed first token
      val toks = Tables.table(spark, sfDir, "documents")
        .filter(col("doc_id") === a).select("text").collect().head.getString(0)
        .toLowerCase.split("[^a-z]+").count(_.nonEmpty)
      val total = toks - TextOps.SubstringW + 1
      assert(n >= total - TextOps.SubstringW && n <= total, s"pair ($a,$b): $n of $total")
    }
  }

  test("q64 perplexity buckets cover all three bands and match a recompute") {
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        "[a-z]+".r.findAllIn(r.getAs[String]("text").toLowerCase).toSeq)
      .toMap
    val nTok = docs.values.map(_.size.toLong).sum.toDouble
    val counts = docs.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size }
    val vocab = counts.size.toDouble
    def nlp(t: String) =
      BigDecimal(-math.log((counts(t) + 1.0) / (nTok + vocab)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val got = graft.operators.TextOps.q64_perplexity_bucket.run(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("avg_nlp"), r.getAs[Int]("n_tok"), r.getAs[String]("bucket")))
      .toMap
    assert(got.keySet == docs.keySet)
    // the fixture spans all three quality bands — else the thresholds
    // are degenerate and the operator proves nothing
    assert(got.values.map(_._3).toSet == Set("head", "middle", "tail"))
    docs.foreach { case (id, toks) =>
      val avg = toks.map(nlp).sum.toDouble / toks.size
      val want = if (avg < 3.40) "head" else if (avg < 3.41) "middle" else "tail"
      assert(got(id)._2 == toks.size, s"doc $id n_tok")
      assert(math.abs(got(id)._1 - avg) < 1e-6, s"doc $id avg_nlp")
      assert(got(id)._3 == want, s"doc $id bucket")
    }
  }

  test("q61 BM25 matches an independent driver-side recompute") {
    val terms = graft.operators.TextOps.Bm25Terms
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        "[a-z]+".r.findAllIn(r.getAs[String]("text").toLowerCase).toSeq)
      .toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / n
    val tf = for {
      (id, toks) <- docs.toSeq; t <- terms
      c = toks.count(_ == t) if c > 0
    } yield (id, t, c.toDouble)
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toDouble }
    val want = tf.groupBy(_._1).map { case (id, xs) =>
      val contribs = xs.map { case (_, t, f) =>
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        val tfw = f * 2.2 / (f + 1.2 * (0.25 + 0.75 * docs(id).size / avgdl))
        BigDecimal(idf * tfw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      id -> (contribs.sum.toDouble, xs.size)
    }
    val got = graft.operators.TextOps.q61_bm25.run(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("bm25"), r.getAs[Int]("n_terms"))).toMap
    assert(got.nonEmpty && got.keySet == want.keySet)
    want.foreach { case (id, (score, nt)) =>
      assert(got(id)._2 == nt, s"doc $id n_terms")
      assert(math.abs(got(id)._1 - score) < 1e-9, s"doc $id: ${got(id)._1} vs $score")
    }
  }

  test("q67 scrub removes duplicated spans keep-first, exact planted strings") {
    import spark.implicits._
    // doc 1: boilerplate (8 tokens) + unique tail  -> FIRST, untouched
    // doc 2: same boilerplate + its own unique tail -> span removed
    // doc 3: fully unique                           -> untouched
    // doc 4: boilerplate REPEATED TWICE in one doc  -> second copy removed
    //        (its first copy is still non-first globally — doc 1 wins)
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"$boiler one two three"),
      (2L, s"$boiler four five six"),
      (3L, "seven eight nine ten eleven twelve thirteen fourteen fifteen"),
      (4L, s"$boiler $boiler")).toDF("doc_id", "text")
    val out = TextOps.substringScrub(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((11, 0, s"$boiler one two three")))
    // doc 2: all windows covering the boilerplate are non-first; the
    // windows sliding into the unique tail differ -> exactly the 8
    // boilerplate positions go
    assert(out(2L) == ((11, 8, "four five six")))
    assert(out(3L) == ((9, 0, "seven eight nine ten eleven twelve thirteen fourteen fifteen")))
    // doc 4: EVERY window (all 9) is a repeat of doc 1's or of its own
    // earlier copy -> all 16 positions removed
    assert(out(4L) == ((16, 16, "")))
  }

  test("q67 differential fuzz: agrees with a driver-side reference scrub") {
    import spark.implicits._
    val W = TextOps.SubstringW
    // reference implementation over raw window STRINGS (the operator
    // keys on md5 of the same strings — equivalent modulo collisions)
    def refScrub(docs: Seq[(Long, String)]): Map[Long, (Int, Int, String)] = {
      val toks = docs.map { case (id, tx) =>
        id -> "[a-z]+".r.findAllIn(tx.toLowerCase).toVector }
      val wins = for {
        (id, t) <- toks
        i <- 1 to t.length - W + 1
      } yield (id, i, t.slice(i - 1, i - 1 + W).mkString(" "))
      val removed = wins.groupBy(_._3).values.filter(_.size > 1)
        .flatMap(_.sortBy(o => (o._1, o._2)).tail
          .flatMap { case (id, pos, _) => (pos until pos + W).map(id -> _) })
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      toks.map { case (id, t) =>
        val rp = removed.getOrElse(id, Set.empty[Int])
        val kept = (1 to t.length).filterNot(rp)
        id -> ((t.length, rp.size, kept.map(p => t(p - 1)).mkString(" ")))
      }.toMap
    }
    val rnd = new scala.util.Random(7)
    val vocab = Vector("ox", "ant", "bee", "cat", "dog", "elk", "fox", "gnu")
    for (trial <- 1 to 4) {
      // tiny vocab + short docs = dense duplicate windows, within-doc
      // repeats, and contested first-occurrence ordering
      val docs = (1L to (20 + rnd.nextInt(30)).toLong).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val got = TextOps.substringScrub(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      assert(got == refScrub(docs), s"trial $trial diverged")
    }
  }

  test("q67 on the fixture: planted near-dup variants lose their shared spans") {
    val out = TextOps.q67_substring_scrub.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val planted = Tables.table(spark, sfDir, "documents")
      .filter(col("doc_id") % 25 === 0).select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val (nt, nr) = out(id + Tables.NearDupOffset)
      // the variant differs only in its first character: every window
      // from position 2 on is a repeat of the base doc (which sorts
      // first), so all but at most the first W tokens are removed
      assert(nt >= TextOps.SubstringW,
        s"variant of $id too short for the claim")
      assert(nr >= nt - TextOps.SubstringW,
        s"variant of $id kept too much: removed $nr of $nt")
    }
    // removal never exceeds the doc, and clean docs exist
    out.values.foreach { case (nt, nr) => assert(nr >= 0 && nr <= nt) }
    assert(out.values.exists(_._2 == 0), "some docs must be untouched")
  }
}
