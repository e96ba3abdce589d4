package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow

/** Dev-only probe access to a DataFrame's execution internals. */
object GraftProbeBridge {
  def toRdd(df: DataFrame): RDD[InternalRow] = df.queryExecution.toRdd

  /** Emulates TopKPerGroupExec's partial heap on (groupLong, idLong,
    * scoreDouble) rows — times the pure heap cost without the
    * operator machinery.
    */
  def manualHeap(df: DataFrame, k: Int): Long = {
    df.queryExecution.toRdd.mapPartitions { it =>
      val heaps = scala.collection.mutable.LongMap
        .empty[scala.collection.mutable.PriorityQueue[(Double, Long)]]
      val ord = Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))
      var n = 0L
      it.foreach { row =>
        val q = row.getLong(0)
        val h = heaps.getOrElseUpdate(q,
          scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord))
        val t = (row.getDouble(2), row.getLong(1))
        if (h.size < k) h.enqueue(t)
        else if (ord.compare(t, h.head) < 0) { h.dequeue(); h.enqueue(t) }
        n += 1
      }
      Iterator.single(n)
    }.sum().toLong
  }
}
