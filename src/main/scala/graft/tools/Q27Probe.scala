package graft.tools
import org.apache.spark.sql.SparkSession
/** Perf probe for q27 (built-in session_window): where does the time go? */
object Q27Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, dir)
    ev.count() // warm page cache + codegen
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    time("scan_count")(ev.count())
    time("groupBy_user_count") {
      ev.groupBy(col("user_id")).count().write.format("noop").mode("overwrite").save()
    }
    val q = graft.SparkEntry.queries("q27_session_window")
    (1 to 3).foreach { i => time(s"q27_full_rep$i") {
      q(spark, dir).write.format("noop").mode("overwrite").save()
    }}
    // variant: pre-project only needed columns before the session agg
    time("q27_narrow_project") {
      ev.select(col("user_id"), col("ts"), col("value"))
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), graft.util.Exact.dsum(col("value"), 2).as("total_value"))
        .select(col("user_id"),
          unix_seconds(col("session_window.start")).as("start_s"),
          unix_seconds(col("session_window.end")).as("end_s"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("start_s"))
        .write.format("noop").mode("overwrite").save()
    }
    // distribution: is one user hot?
    ev.groupBy(col("user_id")).count().orderBy(desc("count")).show(5)
    println(q(spark, dir).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
