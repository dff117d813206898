package graft

import graft.io.Writers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable example of the reference-parity API: the demo-notebook flow
  * (polygon -> regions -> fetch -> subsample -> CSV) on a synthetic
  * point-cloud + catalog. `sbt "runMain graft.Demo [outDir]"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_demo")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Demo polygon (scripts/usgs_lidar.py:467), EPSG:4326.
    val polygon = Seq(
      (-93.759055, 41.925015), (-93.766155, 41.925015),
      (-93.766155, 41.921818), (-93.759055, 41.921818))

    val b = {
      val v = polygon.map { case (lon, lat) =>
        (geo.WebMercator.lonToX(lon), geo.WebMercator.latToY(lat))
      }
      model.Bbox.ofVertices(v)
    }
    val catalog = Seq(
      ("IA_Demo_2009", "IA_Demo", Some(2009),
        b.minx - 1000, b.maxx + 1000, b.miny - 1000, b.maxy + 1000, 1000L),
      ("IA_FullState", "IA_FullState", Option.empty[Int],
        b.minx - 1e6, b.maxx + 1e6, b.miny - 1e6, b.maxy + 1e6, 2000L),
      ("WA_Far_2015", "WA_Far", Some(2015), -1.4e7, -1.3e7, 5.9e6, 6.0e6, 3000L)
    ).toDF("filename", "region", "year", "xmin", "xmax", "ymin", "ymax", "points")

    val rnd = new scala.util.Random(3)
    val points = Seq.fill(5000) {
      val x = b.minx + (rnd.nextDouble() * 1.4 - 0.2) * (b.maxx - b.minx)
      val y = b.miny + (rnd.nextDouble() * 1.4 - 0.2) * (b.maxy - b.miny)
      val cls = if (rnd.nextInt(25) == 0) 7 else 1
      (x, y, 250.0 + rnd.nextDouble() * 50, cls,
        if (rnd.nextBoolean()) "IA_Demo_2009" else "IA_FullState")
    }.toDF("x", "y", "z", "classification", "region")

    val engine = new LidarEngine(spark, catalog, points)

    println("== fetch_regions ==")
    engine.fetchRegions(polygon).show(false)

    val fetched = engine.fetchData(polygon).cache()
    println(s"== fetch_data: ${fetched.count()} points ==")
    fetched.groupBy("matched_region", "year_key").count().orderBy("matched_region").show(false)

    val sub = engine.subsample(
      engine.convertEpsg(
        fetched.select(col("lon").as("x"), col("lat").as("y"), col("elevation").as("z")),
        "x", "y", 4326, 3857),
      100.0)
    println(s"== subsample(res=100m): ${sub.count()} voxels ==")
    sub.orderBy(desc("n")).show(5, false)

    Writers.csv(sub, s"$outDir/subsample_csv")
    println(s"== wrote $outDir/subsample_csv ==")

    // save_heatmap / plot_terrain parity: PNG rasters from the engine's
    // own sinks (JDK encoder, terrain colormap).
    val pts3857 = engine.convertEpsg(
      fetched.select(col("lon").as("x"), col("lat").as("y"), col("elevation").as("z")),
      "x", "y", 4326, 3857)
    val (hw, hh) = engine.saveHeatmap(pts3857, s"$outDir/heatmap.png", cellX = 50.0, cellY = 50.0)
    println(s"== wrote $outDir/heatmap.png (${hw}x$hh) ==")
    val (sw, sh) = engine.plotTerrain(pts3857, s"$outDir/terrain.png", sampleN = 4000)
    println(s"== wrote $outDir/terrain.png (${sw}x$sh) ==")

    // convert_epsg beyond the reference: the same points in UTM zone 15N
    // (Iowa), closed-form Krüger series.
    val utm = engine.convertEpsg(
      fetched.select(col("lon").as("x"), col("lat").as("y")), "x", "y", 4326, 32615)
    println("== convert_epsg 4326 -> UTM 15N (first 3) ==")
    utm.show(3, false)
    sub.explain("formatted")
    spark.stop()
  }
}
