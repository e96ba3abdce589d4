package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sharded JSONL delivery — the hand-off format trainer pipelines
  * actually consume (one JSON document per line, gzip shards of
  * roughly equal size). The curated corpus leaves the engine here:
  * after dedup (q24/q30/q60/q66), quality gating (q47/q57/q64),
  * decontamination (q53) and mixing (q58/q65), this writes the result
  * as `part-*.json.gz` files a data loader streams directly.
  *
  *   - **Deterministic sharding**: rows route to shards by
  *     `pmod(xxhash64(key), n)`, carried as a real `shard=` partition
  *     column — re-running the export reproduces the same membership
  *     (loaders that checkpoint by shard resume correctly), and a
  *     doc's shard never depends on input partitioning. NOTE
  *     `repartition(n, shardExpr)` alone cannot do this: it hashes
  *     the expression AGAIN (two shard ids can collide into one task
  *     and leave another empty), so the repartition here only
  *     CO-LOCATES each shard while `partitionBy` names it.
  *   - **One file per shard dir**: each shard lives wholly in one
  *     task, so `shard=K/` holds exactly one line-complete part file.
  *   - **Codec-splittable trade**: gzip shards are not splittable —
  *     intended, since loaders consume whole shards; pass
  *     `compression = "none"` for splittable plain text.
  */
object JsonlSink {

  def write(df: DataFrame, path: String, shards: Int,
      shardKey: String = "doc_id", compression: String = "gzip"): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.withColumn("shard", pmod(xxhash64(col(shardKey)), lit(shards.toLong)))
      .repartition(shards, col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .option("compression", compression)
      .json(path)
  }

  /** Read an export back with an explicit schema — inference would
    * scan everything once just to guess types, and silently widen
    * (e.g. int → bigint) on dirty shards. The `shard=` partition
    * column is discovery metadata, not payload — dropped.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path).drop("shard")
}
