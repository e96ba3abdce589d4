package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{GraftColumnBridge => CB, GraftDatasetBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

import scala.collection.mutable

/** Top-k rows per group as a FIRST-CLASS operator: logical plan +
  * planner strategy + physical exec, registered via
  * `SparkSessionExtensions` (or `spark.experimental.extraStrategies`).
  *
  * Why not `row_number().over(window) <= k`: the window formulation
  * SORTS every group in full — O(n log n) per group, all rows shuffled.
  * This operator keeps a bounded heap of k rows per group — O(n log k)
  * — and plans as TWO physical stages like an aggregate:
  *
  *   partial TopKPerGroupExec   (per input partition, no distribution
  *                               requirement — runs in the scan stage)
  *      → Exchange(group)       (shuffles at most k rows per group per
  *                               input partition, not the whole table)
  *   final TopKPerGroupExec     (exact top-k per group)
  *
  * At 100 TB the difference is the shuffle: the window plan moves every
  * row; this moves ≤ k·partitions rows per group.
  *
  * Reference analogue: the LinkDB API's sort+limit page serving
  * (controller.go:46-95), generalized to per-key top-k.
  */
case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // rank is born here, not referenced from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child, rank) =>
      // only the FINAL stage emits the rank column (it alone sees each
      // group complete); the partial stage keeps the child schema
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child)), rank) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per group. `partial = true` instances accept any
  * child distribution (map-side); the final instance requires
  * clustering on the group key, which makes Catalyst insert the
  * exchange between the two.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    val childOutput = child.output
    val groupExprsB = groupExprs
    val orderB = order
    val kB = k
    val withRank = rankAttr.isDefined
    val partialB = partial
    val outputSchema = output.map(_.dataType).toArray
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupExprsB, childOutput)
      val ord: Ordering[InternalRow] = GenerateOrdering.generate(orderB, childOutput)
      // max-heap: worst row on top, evicted when a better one arrives
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      // The partial instance is a best-effort pre-filter; when the group
      // key is near-unique within a partition (orders/custkey: ~1 row
      // per key per partition at sf100), every row survives the heap
      // anyway, so the map is 150M hash ops + row copies of pure
      // overhead — and its size is unbounded. Probe the distinct ratio
      // and hand the rest of the partition through untouched; the final
      // stage is exact either way.
      val probeRows = 1 << 17
      val maxKeys = 1 << 21
      var seen = 0L
      var bypass = false
      while (it.hasNext && !bypass) {
        val row = it.next()
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kB) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
        seen += 1
        if (partialB && seen >= probeRows &&
            (heaps.size * 2 > seen || heaps.size >= maxKeys)) bypass = true
      }
      numGroups += heaps.size
      if (!withRank) {
        val heaped = heaps.valuesIterator.flatMap { h =>
          val rows = h.dequeueAll.reverse // ascending by ord — deterministic
          numOutputRows += rows.size
          rows.iterator
        }
        if (bypass) heaped ++ it.map { r => numOutputRows += 1; r }
        else heaped
      } else {
        // rank falls out of the heap's ascending drain — no Window, no
        // per-group sort beyond the k-element heap itself
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val proj = UnsafeProjection.create(outputSchema)
        heaps.valuesIterator.flatMap { h =>
          val rows = h.dequeueAll.reverse
          numOutputRows += rows.size
          rows.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.setInt(0, i + 1)
            proj(joined(r, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {

  /** `topKPerGroup(df, Seq($"cust"), Seq($"price".desc, $"id"), 3)` —
    * exact top-k rows per group under a total order (include a
    * tiebreak column for row_number-identical semantics). With
    * `rank = Some(name)`, an extra int column carries each row's
    * 1-based position within its group — equivalent to keeping the
    * `row_number()` value, but emitted from the final heap drain
    * instead of a Window sort.
    */
  def apply(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int,
      rank: Option[String] = None): DataFrame = {
    require(k > 0, "k must be positive")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (global top-k: use orderBy().limit(k))")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val order = orderCols.map(c => CB.expressionEager(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    val rankAttr = rank.map(n =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        n, org.apache.spark.sql.types.IntegerType, nullable = false)())
    val plan = TopKPerGroupPlan(
      groupCols.map(CB.expressionEager), order, k, df.queryExecution.analyzed, rankAttr)
    GraftDatasetBridge.ofRows(spark, plan)
  }
}
