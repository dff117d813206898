package graft.tools

import graft.{ExtensionQueries, SparkEntry, Tables}
import graft.ops.Checkpoints
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured recall/cost trade of the x68b ANN bitext miner across IVF
  * probe widths — the table the nprobe default rests on (every other
  * approximate operator in the suite documents its knob the same way:
  * the MinHash k/bands tables, the x60 KMV size sweep).
  *
  * For each nprobe, the full x68b pipeline (IVF candidates into the
  * shared margin tail) runs against the exact x68 grid miner and
  * reports: candidate-grid size and its fraction of the exact |en|x|es|
  * grid (the COST), top-1 agreement, kept-pair recall, and precision of
  * the kept set.
  *
  * Usage: runMain graft.tools.BitextTrade <sfDir> [nprobe,nprobe,...]
  */
object BitextTrade {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val probes = args.lift(1).map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 2, 4, 8))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // side sizes, built exactly as x68/x68b build them (embeddings with a
    // documents-lang label)
    val langs = Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("vec_id"), col("lang"))
    val sides = Tables(spark, sfDir, "embeddings").select(col("vec_id"))
      .join(langs, "vec_id")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (nEnSide, nEsSide) = (sides.getOrElse("en", 0L), sides.getOrElse("es", 0L))

    // miner outputs are en-side-sized (hundreds of rows at probe scale);
    // collect once and compare driver-side so the per-probe cache sweep
    // can't invalidate a shared cached frame's checkpoint lineage
    def rows(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Int)] =
      df.select(col("en_id"), col("es_id"), col("keep")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = rows(SparkEntry.queries("x68_bitext_margin")(spark, sfDir))
    graft.util.CacheHygiene.clear(spark)
    val nEn = exact.length
    val exactTop1 = exact.map(r => r._1 -> r._2).toMap
    val exactKept = exact.collect { case (e, s, 1) => (e, s) }.toSet

    println(f"${"nprobe"}%6s ${"cand_pairs"}%11s ${"grid_frac"}%9s ${"top1_agree"}%10s ${"kept_recall"}%11s ${"kept_prec"}%9s")
    probes.foreach { np =>
      val cand = Checkpoints.cut(ExtensionQueries.x68bCandidates(spark, sfDir, np))
      val nCand = cand.count()
      val ann = rows(ExtensionQueries.bitextMarginTail(cand))
      val top1 = ann.count(r => exactTop1.get(r._1).contains(r._2))
      val annKept = ann.collect { case (e, s, 1) => (e, s) }.toSet
      val bothKept = (annKept & exactKept).size
      println(f"$np%6d $nCand%11d ${nCand.toDouble / (nEnSide.toDouble * nEsSide)}%9.3f " +
        f"${top1.toDouble / nEn}%10.3f ${bothKept.toDouble / math.max(1, exactKept.size)}%11.3f " +
        f"${bothKept.toDouble / math.max(1, annKept.size)}%9.3f")
      graft.util.CacheHygiene.clear(spark)
    }
    println(s"sides: $nEnSide en x $nEsSide es; exact miner: $nEn en rows, ${exactKept.size} kept pairs")
    spark.stop()
  }
}
