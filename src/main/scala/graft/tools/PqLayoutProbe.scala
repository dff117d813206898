package graft.tools

import graft.ops.{AnnModels, Checkpoints, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the serving-list bandwidth the r20 compressed layout buys:
  * builds the SAME IVF-PQ index twice over an embeddings fixture — once
  * with reconstruction-carrying lists ([[Similarity.pqLists]], the
  * pre-r20 layout) and once with code-carrying lists
  * ([[Similarity.pqListsCodes]]) — writes both to parquet, and reports
  * per-layout bytes, bytes per list row, measured mean candidates per
  * query at the production probe, and the resulting BYTES SCANNED PER
  * QUERY under each layout. Models ride the shared store (x106's IVF
  * profile, x110's PQ geometry), so repeat runs measure layout cost
  * only.
  *
  * Usage: PqLayoutProbe <sfDir> [outRoot] — e.g. /tmp/sf10.
  */
object PqLayoutProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outRoot = if (args.length > 1) args(1) else "/tmp/pq_layout_probe"
    val dim = 64
    val (m, subDim, cbK) = (16, 4, 16) // x110's 64-bit geometry
    val spill = 2
    val nprobe = 4
    val spark = SparkSession.builder()
      .appName("pq-layout-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    try {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").as("v"))
      val n = e.count()
      val cells = Similarity.sqrtCells(n)
      val trainMod = Similarity.trainSampleMod(n, cells)
      val train =
        if (trainMod == 1L) None
        else Some(e.filter(pmod(col("vec_id"), lit(trainMod)) === 0))
      val model = AnnModels.ivfCentroids(spark, dir, e, cells, 2, dim, train = train)
      val cents = Checkpoints.cut(
        model.select(col("cell_id").as("vec_id"), col("cv").as("v")))
      val ed = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cb = AnnModels.pqCodebooks(spark, dir, ed, m, subDim, cbK, 2)

      def parquetBytes(path: String): Long = {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      }
      def buildAndMeasure(name: String, df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val path = s"$outRoot/$name"
        val t0 = System.nanoTime()
        df.write.mode("overwrite").parquet(path)
        val rows = spark.read.parquet(path).count()
        val bytes = parquetBytes(path)
        println(f"[pqlayout] $name%-12s rows=$rows%d bytes=$bytes%d " +
          f"bytes_per_row=${bytes.toDouble / rows}%.1f " +
          f"build_s=${(System.nanoTime() - t0) / 1e9}%.1f")
        (rows, bytes)
      }
      val (rRows, rBytes) = buildAndMeasure("recon",
        Similarity.pqLists(e, cents, cb, dim, subDim, spill))
      val (cRows, cBytes) = buildAndMeasure("codes",
        Similarity.pqListsCodes(e, cents, cb, dim, subDim, spill))

      // measured candidates per query at the production probe (50-query
      // sample): probe cells, count list entries met — no scoring pass
      val q = e.filter(col("vec_id") < 50)
      val probed = Similarity.ivfProbe(q, cents, dim, nprobe)
        .select(col("vec_id").as("qid"), col("cell_id").as("qcell"))
      val lists = spark.read.parquet(s"$outRoot/codes")
      val meanCands = lists.join(broadcast(probed),
          col("cell_id") === col("qcell") && col("vec_id") =!= col("qid"))
        .groupBy(col("qid")).agg(countDistinct(col("vec_id")).as("nc"))
        .agg(avg(col("nc"))).head().getDouble(0)
      val rBpr = rBytes.toDouble / rRows
      val cBpr = cBytes.toDouble / cRows
      println(f"[pqlayout] n=$n%d cells=$cells%d spill=$spill nprobe=$nprobe " +
        f"mean_cands_per_query=$meanCands%.1f")
      println(f"[pqlayout] scan_bytes_per_query recon=${meanCands * rBpr}%.0f " +
        f"codes=${meanCands * cBpr}%.0f ratio=${rBpr / cBpr}%.1fx " +
        f"(list totals: recon=$rBytes%d codes=$cBytes%d, ${rBytes.toDouble / cBytes}%.1fx)")
    } finally spark.stop()
  }
}
