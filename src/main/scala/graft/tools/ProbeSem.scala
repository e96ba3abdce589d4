package graft.tools

import org.apache.spark.sql.functions._

/** SemDeDup cluster-assignment recall probe (dev tool): for the
  * planted near-dup pattern (v, v+EmbDupOffset at cos ≈ 1-1e-7), how
  * often does the pair SHARE its assigned cluster — decomposed into
  * coarse-cell agreement vs sign-bit agreement — under the single-probe
  * and multi-probe assignments? This is the measurement behind the r18
  * multi-probe knob (verdict item 3; R17f recorded ~43% funnel recall
  * at sf100 width).
  *
  * {{{ tools/run_main.sh graft.tools.ProbeSem /tmp/graft_sf100 }}}
  */
object ProbeSem {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors)
    val spark = graft.GraftConf.local(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sim = graft.operators.SimilarityOps
    val e = graft.Tables.embWithNearDups(spark, dir)
    val n = e.count()
    println(s"[probe-sem] n=$n cells=${sim.semdedupCellsFor(n)}")
    val assigned = sim.semdedupAssign(e, n)
      .select(col("vec_id"), col("cell"), col("sd_cluster"))
    val a = assigned.filter(col("vec_id") < graft.Tables.EmbDupOffset &&
        col("vec_id") % graft.Tables.DupEvery === 0)
      .select(col("vec_id").as("a_id"), col("cell").as("a_cell"),
        col("sd_cluster").as("a_sd"))
    val b = assigned.filter(col("vec_id") >= graft.Tables.EmbDupOffset)
      .select((col("vec_id") - graft.Tables.EmbDupOffset).as("a_id"),
        col("cell").as("b_cell"), col("sd_cluster").as("b_sd"))
    val j = a.join(b, "a_id")
      .agg(count(lit(1)).as("pairs"),
        sum((col("a_cell") === col("b_cell")).cast("long")).as("same_cell"),
        sum((col("a_sd") === col("b_sd")).cast("long")).as("same_cluster"))
      .collect().head
    println(s"[probe-sem] single-probe: pairs=${j.getLong(0)} " +
      s"same_cell=${j.getLong(1)} same_cluster=${j.getLong(2)}")

    // the plantsem REHEARSAL pattern (ExportRehearsal): vec b+1 :=
    // nudged copy of vec b for b % 25 == 0, all ids in-range — the
    // pattern whose funnel recall R17f recorded as ~43%
    val emb0 = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val victims = emb0.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 1).as("vec_id"),
        expr("transform(embedding, (x, i) -> if(i = 0, cast(x + 0.001f as float), x))")
          .as("embedding"))
    val planted = emb0.filter(col("vec_id") % 25 =!= 1).unionAll(victims)
    val n2 = planted.count()
    val assigned2 = sim.semdedupAssign(planted, n2)
      .select(col("vec_id"), col("cell"), col("sd_cluster"))
    val a2 = assigned2.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("a_id"), col("cell").as("a_cell"),
        col("sd_cluster").as("a_sd"))
    val b2 = assigned2.filter(col("vec_id") % 25 === 1)
      .select((col("vec_id") - 1).as("a_id"), col("cell").as("b_cell"),
        col("sd_cluster").as("b_sd"))
    val j2 = a2.join(b2, "a_id")
      .agg(count(lit(1)).as("pairs"),
        sum((col("a_cell") === col("b_cell")).cast("long")).as("same_cell"),
        sum((col("a_sd") === col("b_sd")).cast("long")).as("same_cluster"))
      .collect().head
    println(s"[probe-sem] plantsem pattern: pairs=${j2.getLong(0)} " +
      s"same_cell=${j2.getLong(1)} same_cluster=${j2.getLong(2)}")

    // multi-probe (top-2) coverage on the same planted pattern: a pair
    // is covered iff ANY of its cluster assignments coincide
    val multi = sim.semdedupAssignMulti(e, n)
      .select(col("vec_id"), col("sd_cluster"))
    val ma = multi.filter(col("vec_id") < graft.Tables.EmbDupOffset &&
        col("vec_id") % graft.Tables.DupEvery === 0)
      .select(col("vec_id").as("a_id"), col("sd_cluster"))
    val mb = multi.filter(col("vec_id") >= graft.Tables.EmbDupOffset)
      .select((col("vec_id") - graft.Tables.EmbDupOffset).as("a_id"),
        col("sd_cluster"))
    val covered = ma.join(mb, Seq("a_id", "sd_cluster"))
      .select(col("a_id")).distinct().count()
    println(s"[probe-sem] multi-probe (top-2): covered=$covered of 80000 planted pairs")
    spark.stop()
  }
}
