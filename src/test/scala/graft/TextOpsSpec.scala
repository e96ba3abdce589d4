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
      assert(clusters.contains(id) && clusters.contains(id + 2000000L))
      assert(clusters(id) == clusters(id + 2000000L),
        s"doc $id and its near-dup must share a cluster")
      assert(clusters(id) <= id, "cluster id is the component minimum")
    }
  }

  test("q36 labels are component minima (idempotent under re-propagation)") {
    val df = TextOps.q36_dup_clusters.run(spark, sfDir)
    // every cluster_id must itself be a member of the cluster
    val ids = df.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val labels = df.select(col("cluster_id")).collect().map(_.getLong(0)).toSet
    assert(labels.subsetOf(ids))
  }
}
