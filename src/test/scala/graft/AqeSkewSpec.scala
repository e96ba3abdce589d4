package graft

import org.apache.spark.sql.functions._

/** SURVEY §5 claims AQE's skew-join split absorbs Zipfian domain skew
  * without manual salting (q37 stays for the pathological tail). This
  * spec makes the claim executable: a deliberately skewed join, AQE
  * thresholds scaled DOWN to fixture bytes (the same ratios a real
  * cluster runs at 64 MB advisory), and an assertion that the
  * optimizer actually split the hot partition.
  */
class AqeSkewSpec extends SparkSpec {

  private val Knobs = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // hot = >2x median AND >64 KB (defaults 5x / 256 MB — same shape,
    // fixture-sized; sizes are COMPRESSED map-output bytes); split
    // targets ~16 KB chunks
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
    // the dim must not broadcast, or there is no shuffle to skew
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("AQE splits the skewed partition of a Zipfian join without manual salt") {
    val saved = Knobs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      Knobs.foreach { case (k, v) => spark.conf.set(k, v) }
      import spark.implicits._
      // q37's shape, unsalted: Zipfian fact (one domain carries ~20k of
      // 22k rows, each with a ~100-byte payload so the hot reducer
      // clears the byte threshold) joined to a per-domain dim
      val fact = spark.range(22000).select(
        when($"id" < 20000, lit("d0.com"))
          .otherwise(concat(lit("d"), ($"id" % 50) + 1, lit(".com"))).as("link_domain"),
        // skew detection reads COMPRESSED map-output sizes — a constant
        // filler would lz4 away to nothing, so the payload is hashes
        concat(md5($"id".cast("string")), md5(($"id" + 1).cast("string")),
          md5(($"id" + 2).cast("string"))).as("payload"),
        lit(1L).as("qty"))
      val dim = spark.range(51).select(
        when($"id" === 0, lit("d0.com"))
          .otherwise(concat(lit("d"), $"id", lit(".com"))).as("link_domain"),
        ($"id" + 7).as("domain_weight"))
      // global sum only: a groupBy(link_domain) downstream would REQUIRE
      // the join's hash partitioning and veto the skew split — that
      // interaction is exactly why this is worth a spec. The payload
      // must be REFERENCED or column pruning strips it before the
      // shuffle and the hot partition never clears the byte threshold
      // (the first draft of this spec proved that the hard way).
      val joined = fact.join(dim.hint("merge"), "link_domain")
        .agg(sum($"qty" * $"domain_weight").as("total"),
          sum(length($"payload")).as("payload_bytes"))
      val row = joined.collect().head
      // exact expectation: hot domain 20000*7; cold id i in 1..50 has
      // 40 rows of weight i+7; payload rode the shuffle (> 90 B/row)
      assert(row.getLong(0) == 20000L * 7 + (1 to 50).map(i => 40L * (i + 7)).sum)
      assert(row.getLong(1) > 22000L * 90)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skew-split:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
