package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspection probe: prints the physical plan of the named
  * SparkEntry queries (args; default the round's newest additions)
  * against sf0.001 — the manual .explain loop behind PlanSpec's pins.
  */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("x54_scd2_history", "x55_table_profile", "x56_connected_components")
    for (n <- names) {
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString)
    }
  }
}
