package graft.tools

import graft.ops.{AnnModels, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the [[AnnModels.rebuildDue]] trigger: generate
  * the stationary and shifted planted-cluster fixtures (ClusterGen, the
  * r18 sweep geometry), train the BASE-era index (arrivals excluded, the
  * x114 stale arm), and print the maintenance verdict for each regime —
  * the numbers that justify the spec's fire/stay-quiet pins and the
  * SCALECHECK row. Args: [nVec] [kClusters] [nprobe].
  */
object RebuildProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000L)
    val k = args.lift(1).map(_.toInt).getOrElse(20)
    val nprobe = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 64
    val cells = Similarity.sqrtCells(n)
    for (shift <- Seq(false, true)) {
      val tag = if (shift) "shifted" else "stationary"
      val dir = s"/tmp/ann_rebuild_${tag}_$n"
      ClusterGen.frame(spark, n, dim, k, 0.7, shiftArrivals = shift)
        .repartition(8).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").as("v"))
      val base = e.filter(pmod(col("vec_id"), lit(5L)) =!= 0)
      val arrivals = e.filter(pmod(col("vec_id"), lit(5L)) === 0)
      val t0 = System.nanoTime()
      val baseModel = AnnModels.ivfCentroids(spark, dir, base, cells, 2, dim)
      val v = AnnModels.rebuildDue(
        spark, dir, e, arrivals, baseModel, dim, nprobe, spill = 2)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[rebuild-probe] $tag%-10s N=$n cells=$cells nprobe=$nprobe " +
        f"arrivals=${v.nArrivals} sample=${v.nSample} recall=${v.recallArrivals}%.4f " +
        f"candFrac=${v.candFraction}%.4f design=${v.designFraction}%.4f " +
        f"cap=${v.candFractionMax}%.4f due=${v.rebuildDue} (${sec}%.1f s)")
    }
    spark.stop()
  }
}
