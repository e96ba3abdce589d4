package graft

import graft.plans.BoundedCollectSet
import org.apache.spark.sql.functions._

class BoundedCollectSetSpec extends SparkSpec {

  test("collects distinct sorted below the cap, NULL at the cap, exact boundary") {
    import spark.implicits._
    // key a: 3 distinct values (with repeats) — collected sorted
    // key b: exactly cap distinct — still collected
    // key c: cap+1 distinct — NULL
    val cap = 5
    val rows =
      Seq(("a", 30L), ("a", 10L), ("a", 20L), ("a", 10L)) ++
        (1L to cap.toLong).map(("b", _)) ++
        (1L to (cap + 1).toLong).map(("c", _))
    val out = rows.toDF("k", "v")
      .repartition(7) // spread keys across partitions: exercises merge()
      .groupBy($"k").agg(BoundedCollectSet.of($"v", cap).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out("a").contains(Seq(10L, 20L, 30L)))
    assert(out("b").contains((1L to cap.toLong).toSeq))
    assert(out("c").isEmpty, "over-cap key must evaluate to NULL")
  }

  test("string elements: sorted, deduped, capped") {
    import spark.implicits._
    val out = Seq(("k", "dom-b"), ("k", "dom-a"), ("k", "dom-b"), ("k", "dom-c"))
      .toDF("k", "v").repartition(3)
      .groupBy($"k").agg(BoundedCollectSet.of($"v", 8).as("ids"))
      .collect().map(_.getSeq[String](1)).head
    assert(out == Seq("dom-a", "dom-b", "dom-c"))
  }

  test("agrees with collect_set + size filter on the q31 bucket shape") {
    // the retrofit invariant: on data where no key is hot, the bounded
    // aggregate must produce exactly what the old
    // collect_list + between(2, cap) produced
    val chunks = Tables.docsWithNearDups(spark, sfDir)
      .select(col("doc_id"), graft.plans.SimHashSig.of(col("text")).as("sig"))
      .select(col("doc_id"),
        posexplode(graft.plans.SimHashSig.pigeonholeChunks("sig"))
          .as(Seq("chunk_id", "chunk_val")))
    val bounded = chunks.groupBy(col("chunk_id"), col("chunk_val"))
      .agg(BoundedCollectSet.of(col("doc_id"), 64).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
    val legacy = chunks.groupBy(col("chunk_id"), col("chunk_val"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 64))
    assert(bounded.exceptAll(legacy).isEmpty && legacy.exceptAll(bounded).isEmpty)
  }

  test("differential fuzz: agrees with driver-side reference semantics") {
    import spark.implicits._
    // seeded (deterministic) sweep over key counts, caps, duplicate
    // densities and partitionings — every trial checks the exact
    // contract: sorted distinct values below the cap, NULL above it
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val nKeys = 1 + rnd.nextInt(30)
      val cap = 1 + rnd.nextInt(12)
      val parts = 1 + rnd.nextInt(8)
      val rows = (1 to 500 + rnd.nextInt(2000))
        .map(_ => (s"k${rnd.nextInt(nKeys)}", rnd.nextInt(40).toLong))
      val got = rows.toDF("k", "v").repartition(parts)
        .groupBy($"k").agg(BoundedCollectSet.of($"v", cap).as("ids"))
        .collect()
        .map(r => r.getString(0) -> Option(r.getSeq[Long](1)).map(_.toList)).toMap
      val want = rows.groupBy(_._1).map { case (k, vs) =>
        val d = vs.map(_._2).distinct.sorted.toList
        k -> (if (d.size > cap) None else Some(d))
      }
      assert(got == want, s"trial $trial nKeys=$nKeys cap=$cap parts=$parts")
    }
  }

  test("survives the sort-based aggregation fallback byte-identically") {
    import spark.implicits._
    // ObjectHashAggregate falls back to sort-based aggregation past
    // this many distinct keys — the fallback exercises serialize/
    // deserialize on PARTIAL buffers (including overflow tombstones),
    // a path the hash route never touches
    val conf = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val saved = spark.conf.getOption(conf)
    try {
      val rows = (0L until 4000L).map(i => (s"k${i % 200}", i % 5)) ++
        (0L until 100L).map(i => ("hot", i)) // over an 8-cap: tombstone
      def run() = rows.toDF("k", "v").repartition(5)
        .groupBy($"k").agg(BoundedCollectSet.of($"v", 8).as("ids"))
        .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1)).map(_.toList)).toMap
      spark.conf.set(conf, "2")
      val fallback = run()
      spark.conf.unset(conf)
      val hash = run()
      assert(fallback == hash, "fallback path must agree with hash path")
      assert(fallback("hot").isEmpty, "tombstone must survive serialization")
    } finally saved.fold(spark.conf.unset(conf))(spark.conf.set(conf, _))
  }

  test("degenerate key rehearsal: 50k docs sharing one boilerplate window complete flat") {
    import spark.implicits._
    // the 100 TB failure mode the guard exists for: one boilerplate
    // 8-token window shared by EVERY doc. collect_list would build a
    // 50k-element array in one reducer buffer before any size filter
    // ran; the bounded aggregate must keep every buffer ≤ cap+1 and
    // drop the hot window during aggregation. Each doc also carries
    // unique windows, which must survive untouched.
    val boiler = "subscribe to our newsletter for updates and offers today"
    val n = 50000L
    val docs = spark.range(n).select(
      $"id".as("doc_id"),
      concat(lit(boiler + " "),
        concat_ws(" ", (0 until 8).map(j => concat(lit(s"u${j}w"), $"id")): _*))
        .as("text"))
    val wh = docs
      .select(col("doc_id"), expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("t"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 7), i -> md5(concat_ws(' ', slice(t, i, 8))))")).as("h"))
    val buckets = wh.groupBy(col("h"))
      .agg(BoundedCollectSet.of(col("doc_id"), 64).as("ids"))
    // hot windows (the boilerplate run yields several: every window
    // overlapping it is shared by all 50k docs) are NULL; everything
    // else is a singleton — so no pair survives
    val hot = buckets.filter(col("ids").isNull).count()
    val survivors = buckets.filter(col("ids").isNotNull && size(col("ids")) >= 2).count()
    assert(hot >= 1, "the planted boilerplate window must overflow")
    assert(survivors == 0, "unique windows must not pair")
    // and the per-doc unique windows all made it through individually
    assert(buckets.filter(size(col("ids")) === 1).count() >= n)
  }
}
