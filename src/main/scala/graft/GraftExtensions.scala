package graft

import graft.functions.Etld1
import graft.plans.{CompressionRatio, GramHashes, MinHashAgg, MinHashSig, SimHashSig, SortedIntersectCount}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the custom expressions. Load at session build time:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * or imperatively on an existing session (`GraftExtensions.register`),
  * after which `SELECT minhash_sig(text), simhash_sig(text) FROM docs`
  * works from plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
    ext.injectOptimizerRule(_ => graft.plans.RewriteCappedCollectToBounded)
  }
}

object GraftExtensions {

  private def minhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => MinHashSig(c)
    case Seq(c, Literal(k: Int, _)) => MinHashSig(c, k)
    case _ => throw new IllegalArgumentException(
      "minhash_sig(text[, numHashes literal]) expects 1 or 2 arguments")
  }

  private def simhashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => SimHashSig(c)
    case _ => throw new IllegalArgumentException("simhash_sig(text) expects 1 argument")
  }

  private def minhashAggBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => MinHashAgg(c)
    case Seq(c, Literal(k: Int, _)) => MinHashAgg(c, k)
    case _ => throw new IllegalArgumentException(
      "minhash_agg(text[, numHashes literal]) expects 1 or 2 arguments")
  }

  private def compressionRatioBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => CompressionRatio(c)
    case _ => throw new IllegalArgumentException("compression_ratio(text) expects 1 argument")
  }

  private def etld1Builder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => Etld1(c)
    case _ => throw new IllegalArgumentException("etld1(host) expects 1 argument")
  }

  private def gramHashesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(c, Literal(k: Int, _)) => GramHashes(c, k)
    case _ => throw new IllegalArgumentException(
      "gram_hashes(text, k literal) expects (column, int literal)")
  }

  private def sortedIntersectBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => SortedIntersectCount(a, b)
    case _ => throw new IllegalArgumentException(
      "sorted_intersect_count(a, b) expects 2 sorted-array arguments")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      minhashBuilder _),
    (FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      simhashBuilder _),
    (FunctionIdentifier("minhash_agg"),
      new ExpressionInfo(classOf[MinHashAgg].getName, "minhash_agg"),
      minhashAggBuilder _),
    (FunctionIdentifier("compression_ratio"),
      new ExpressionInfo(classOf[CompressionRatio].getName, "compression_ratio"),
      compressionRatioBuilder _),
    (FunctionIdentifier("etld1"),
      new ExpressionInfo(classOf[Etld1].getName, "etld1"),
      etld1Builder _),
    (FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
      gramHashesBuilder _),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      sortedIntersectBuilder _))

  /** Imperative registration for sessions built without the extension. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
