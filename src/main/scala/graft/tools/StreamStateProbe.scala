package graft.tools

import java.sql.Timestamp

import graft.streaming.{DocStreams, EventStreams}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-state-at-scale probe: drives the stateful streaming
  * operators with a multi-million-event feed over 50+ micro-batches and
  * reports state-store size and trigger latency per batch — the evidence
  * behind SURVEY's "bounded state / flat trigger cost" claims.
  *
  *  1. [[EventStreams.windowedTopUsers]]: hourly Misra-Gries top-K with a
  *     2 h watermark. Expectation: state rows track the OPEN windows (2-3
  *     sketches), not the event count — state is O(windows * m), and the
  *     watermark closes windows as event time advances, so rows plateau.
  *  2. [[DocStreams.nearDupIngest]]: the parquet-table LSH index with a
  *     dedup horizon. Expectation: per-batch wall time tracks the horizon
  *     (the store read prunes batch_id partitions), not total history,
  *     and [[DocStreams.compactStore]] keeps the store file count flat.
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- 1. windowedTopUsers: 60 batches x 40k events = 2.4M events ----
    val batches = args.headOption.map(_.toInt).getOrElse(60)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(40000)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[EventStreams.Event]
    val q = EventStreams.windowedTopUsers(src.toDF())
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("probe-ck").toString)
      .start()
    val t0 = System.currentTimeMillis()
    println(f"${"batch"}%6s ${"events"}%9s ${"stateRows"}%10s ${"stateMB"}%8s ${"trigMs"}%7s")
    var maxRows = 0L
    (0 until batches).foreach { b =>
      // event time advances 10 min/batch -> a 1 h window closes every 6
      // batches once the 2 h watermark passes it
      val base = b.toLong * 600000L
      val ev = (0 until perBatch).map { i =>
        EventStreams.Event(
          event_id = b.toLong * perBatch + i,
          ts = new Timestamp(1700000000000L + base + (i % 600) * 1000L),
          user_id = (i * 2654435761L) % 5000L, // mixed spread, repeats across batches
          event_type = "view", value = 1.0)
      }
      src.addData(ev)
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty && (b % 5 == 0 || b == batches - 1)) {
        val so = p.stateOperators(0)
        maxRows = math.max(maxRows, so.numRowsTotal)
        println(f"$b%6d ${(b + 1).toLong * perBatch}%9d ${so.numRowsTotal}%10d " +
          f"${so.memoryUsedBytes / 1e6}%8.2f ${p.durationMs.get("triggerExecution")}%7d")
      }
    }
    q.stop()
    println(f"windowedTopUsers: ${batches * perBatch} events total, " +
      f"max state rows $maxRows (bounded by open windows, not events), " +
      f"wall ${(System.currentTimeMillis() - t0) / 1000.0}%.1f s")

    // --- 2. nearDupIngest: 50 micro-batches with a 10-batch horizon ----
    // File-source feed, one restarted AvailableNow run per batch (the
    // DocStreamsSpec drive pattern — each run picks up the new file).
    val tmp = java.nio.file.Files.createTempDirectory("probe-neardup").toString
    val srcDir = s"$tmp/src"; new java.io.File(srcDir).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def storeFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$tmp/store")).count(_.getName.endsWith(".parquet"))
    }
    val docBatches = 50
    val times = new Array[Double](docBatches)
    (0 until docBatches).foreach { b =>
      val w = new java.io.PrintWriter(s"$srcDir/b$b.json")
      (0 until 400).foreach { i =>
        val id = b.toLong * 1000 + i
        // every 5th doc near-copies a doc from the previous batch
        val seed = if (i % 5 == 0 && b > 0) (b - 1).toLong * 1000 + i else id
        val body = (0 until 40).map(j => s"w${(seed * 31 + j) % 211}").mkString(" ")
        w.println(s"""{"doc_id": $id, "text": "doc ${seed % 97} $body"}""")
      }
      w.close()
      val t = System.nanoTime()
      val q = DocStreams.nearDupIngest(
        spark.readStream.schema(schema).json(srcDir),
        s"$tmp/sink", s"$tmp/store", s"$tmp/ck",
        horizonBatches = Some(10L))
      // awaitTermination(timeout) returns false on timeout — starting the
      // next run against a still-active checkpoint would throw/skew times
      require(q.awaitTermination(120000), s"batch $b exceeded 120 s — machine too loaded to probe")
      times(b) = (System.nanoTime() - t) / 1e9
      if (b == 25) {
        val before = storeFiles()
        DocStreams.compactStore(spark, s"$tmp/store", upToBatchId = 24L, evictBeforeBatchId = 15L)
        println(s"compactStore at batch 25: store files $before -> ${storeFiles()}")
      }
    }
    def avg(r: Range) = r.map(times).sum / r.size
    println(f"nearDupIngest: $docBatches batches x 400 docs, horizon 10: " +
      f"avg batch s early(5-15)=${avg(5 until 15)}%.2f late(40-50)=${avg(40 until 50)}%.2f " +
      "(flat => horizon-bounded, not history-bounded)")
    println(s"store parquet files at end: ${storeFiles()}")
    spark.stop()
  }
}
