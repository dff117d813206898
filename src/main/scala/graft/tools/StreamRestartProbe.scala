package graft.tools

import java.sql.Timestamp

import graft.streaming.{DocStreams, EventStreams}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Failure-injection soak for the streaming surface: kill a query
  * MID-RUN, delete the newest commit marker (the crash window where the
  * offset WAL is written but the commit is not — so the engine must
  * REPLAY that batch on restart), restart from the checkpoint, finish
  * the feed, and require the output to agree exactly with an
  * uninterrupted twin run.
  *
  * Two sink disciplines are probed, because they achieve exactly-once
  * differently:
  *
  *  1. [[EventStreams.windowedTopUsers]] -> parquet FILE sink: the sink's
  *     `_spark_metadata` log keys by batchId, so the replayed batch's
  *     files are skipped ("already committed") while the state store
  *     rolls back to the pre-batch version and re-applies — sketch state
  *     and emitted windows stay consistent.
  *  2. [[DocStreams.nearDupIngest]] -> foreachBatch with
  *     `batch_id=N` overwrite partitions (the CatalogStream pattern,
  *     generalized to a STATEFUL pipeline whose admit decisions read the
  *     store): a replayed batch overwrites its own partial output, and
  *     the store read's `batch_id < N` guard keeps the replay's
  *     dedup decisions identical to the first execution.
  *
  * `run` returns (phase, rows, agree) lines; `main` prints the SURVEY
  * table at soak scale.
  */
object StreamRestartProbe {

  final case class Result(probe: String, batches: Int, killAt: Int, rows: Long, agree: Boolean)

  private def mkEvents(b: Int, perBatch: Int): Seq[EventStreams.Event] = {
    val base = b.toLong * 600000L // event time advances 10 min per batch
    (0 until perBatch).map { i =>
      EventStreams.Event(
        event_id = b.toLong * perBatch + i,
        ts = new Timestamp(1700000000000L + base + (i % 600) * 1000L),
        user_id = (i * 2654435761L) % 5000L,
        event_type = "view", value = 1.0)
    }
  }

  /** Delete batch `id`'s commit marker (plus its .crc sidecar) so the
    * restart replays it.
    */
  private def dropCommit(checkpoint: String, id: Long): Unit = {
    val dir = new java.io.File(s"$checkpoint/commits")
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.getName == id.toString || f.getName.startsWith(s".$id."))
      .foreach(f => require(f.delete(), s"could not delete ${f.getPath}"))
  }

  private def sortedRows(df: DataFrame): Array[String] =
    df.collect().map(_.toString).sorted

  /** sourceDriftMonitor (mapGroupsWithState, Update mode) through a
    * foreachBatch parquet append, killed + replayed at `killAt`, vs an
    * uninterrupted twin. foreachBatch is at-least-once, so the replayed
    * batch appends its rows twice — the contract probed is therefore on
    * the FINAL STATE: for every source, the row with the highest batch id
    * (its latest emission, a pure function of accumulated counts) must be
    * identical across the killed and uninterrupted runs, which is exactly
    * the state-store-restores-to-pre-batch-version guarantee the monitor
    * leans on.
    */
  def runDrift(spark: SparkSession, batches: Int, perBatch: Int, killAt: Int): Result = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("restart-drift").toString
    val reference = graft.ops.CorpusMix.smoothed(
      graft.ops.CorpusMix.bucketCounts("the quick brown fox jumps over the lazy dog " * 40))

    def mkDocs(b: Int): Seq[(String, String)] =
      (0 until perBatch).map { i =>
        val src = s"s${i % 3}"
        // per-source style drifts with the batch index, so each batch
        // genuinely moves the accumulated distribution
        (src, s"source $src batch $b token${(b * perBatch + i) % 97} " +
          s"word${i % 13} filler${(i * 31) % 41} " * 3)
      }

    def sink(name: String) = s"$root/$name/out"
    def chk(name: String) = s"$root/$name/chk"
    def start(src: MemoryStream[(String, String)], name: String) =
      DocStreams.sourceDriftMonitor(src.toDF().toDF("source", "text"), reference)
        .writeStream.outputMode("update")
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[DocStreams.SourceDrift], bid: Long) =>
          ds.withColumn("bid", lit(bid))
            .write.mode("append").parquet(sink(name))
        }
        .option("checkpointLocation", chk(name))
        .start()

    def finalRows(name: String): Array[String] = {
      val df = spark.read.parquet(sink(name))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("bid").desc)
      sortedRows(df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn", "bid"))
    }

    val srcA = MemoryStream[(String, String)]
    val qA = start(srcA, "twin")
    (0 until batches).foreach { b => srcA.addData(mkDocs(b)); qA.processAllAvailable() }
    qA.stop()

    val srcB = MemoryStream[(String, String)]
    var qB = start(srcB, "killed")
    (0 until killAt).foreach { b => srcB.addData(mkDocs(b)); qB.processAllAvailable() }
    qB.stop()
    dropCommit(chk("killed"), killAt - 1)
    qB = start(srcB, "killed")
    (killAt until batches).foreach { b => srcB.addData(mkDocs(b)); qB.processAllAvailable() }
    qB.stop()

    val twin = finalRows("twin")
    val killed = finalRows("killed")
    Result("sourceDriftMonitor/final-state", batches, killAt, killed.length.toLong,
      twin.nonEmpty &&
        java.util.Arrays.equals(twin.asInstanceOf[Array[AnyRef]], killed.asInstanceOf[Array[AnyRef]]))
  }

  /** temperatureMixMonitor (Complete-mode count aggregate + foreachBatch
    * apportionment), killed + replayed at `killAt`, vs an uninterrupted
    * twin. foreachBatch is at-least-once, so the replayed batch appends
    * its allocation table twice; the probed contract is the FINAL
    * allocation — for every source, the row with the highest batch id
    * must be identical across runs (the allocation is a pure integer
    * function of the state-store counts, so agreement here certifies the
    * counts rolled back and re-applied exactly).
    */
  def runMix(spark: SparkSession, batches: Int, perBatch: Int, killAt: Int): Result = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("restart-mix").toString

    // skewed source sizes, drifting with the batch index, so every
    // trigger genuinely reshuffles the largest-remainder ranks
    def mkDocs(b: Int): Seq[String] =
      (0 until perBatch).map(i => s"s${(i * (b + 3)) % 5 % (2 + b % 3 + 1)}")

    def sink(name: String) = s"$root/$name/out"
    def chk(name: String) = s"$root/$name/chk"
    def start(src: MemoryStream[String], name: String) =
      DocStreams.temperatureMixMonitor(
        src.toDF().toDF("source"), alpha = 0.3, budget = 10000L, chk(name),
        (alloc, bid) => alloc.withColumn("bid", lit(bid))
          .write.mode("append").parquet(sink(name)))

    def finalRows(name: String): Array[String] = {
      val df = spark.read.parquet(sink(name))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("bid").desc)
      sortedRows(df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn", "bid"))
    }

    val srcA = MemoryStream[String]
    val qA = start(srcA, "twin")
    (0 until batches).foreach { b => srcA.addData(mkDocs(b)); qA.processAllAvailable() }
    qA.stop()

    val srcB = MemoryStream[String]
    var qB = start(srcB, "killed")
    (0 until killAt).foreach { b => srcB.addData(mkDocs(b)); qB.processAllAvailable() }
    qB.stop()
    dropCommit(chk("killed"), killAt - 1)
    qB = start(srcB, "killed")
    (killAt until batches).foreach { b => srcB.addData(mkDocs(b)); qB.processAllAvailable() }
    qB.stop()

    val twin = finalRows("twin")
    val killed = finalRows("killed")
    Result("temperatureMixMonitor/final-alloc", batches, killAt, killed.length.toLong,
      twin.nonEmpty &&
        java.util.Arrays.equals(twin.asInstanceOf[Array[AnyRef]], killed.asInstanceOf[Array[AnyRef]]))
  }

  /** domainGateMonitor (Complete-mode domain aggregate: count + decimal
    * quality sum + KMV url sketch, served via foreachBatch), killed +
    * replayed at `killAt`, vs an uninterrupted twin. Same final-row
    * contract as runMix: for every domain the highest-batch-id gate row
    * must be identical — agreement certifies count, decimal sum, AND
    * the KMV sketch state all rolled back and re-applied exactly.
    */
  def runDomainGate(spark: SparkSession, batches: Int, perBatch: Int, killAt: Int): Result = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("restart-domain").toString

    // four domains (one blocklisted, one multi-label suffix), url paths
    // cycling so canon duplicates accumulate across batches, text with
    // batch-dependent quality drift
    def mkDocs(b: Int): Seq[(String, String)] =
      (0 until perBatch).map { i =>
        val dom = (i + b) % 4 match {
          case 0 => "acme.com"
          case 1 => "acme.co.uk"
          case 2 => "other.com"
          case _ => "badactor.net"
        }
        val url = s"https://www.$dom/p/${(i * (b + 2)) % 7}?a=1" +
          (if (i % 3 == 0) "&utm_source=x" else "")
        val text = s"the cat and the dog sat in field ${i % 5} of batch $b " +
          ("and the sun came out " * (1 + i % 3))
        (url, text)
      }

    def sink(name: String) = s"$root/$name/out"
    def chk(name: String) = s"$root/$name/chk"
    def start(src: MemoryStream[(String, String)], name: String) =
      DocStreams.domainGateMonitor(
        src.toDF().toDF("url", "text"), blocklist = Seq("badactor.net"),
        checkpointPath = chk(name),
        onTrigger = (t, bid) => t.withColumn("bid", lit(bid))
          .write.mode("append").parquet(sink(name)),
        k = 64)

    def finalRows(name: String): Array[String] = {
      val df = spark.read.parquet(sink(name))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain")).orderBy(col("bid").desc)
      sortedRows(df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn", "bid"))
    }

    val srcA = MemoryStream[(String, String)]
    val qA = start(srcA, "twin")
    (0 until batches).foreach { b => srcA.addData(mkDocs(b)); qA.processAllAvailable() }
    qA.stop()

    val srcB = MemoryStream[(String, String)]
    var qB = start(srcB, "killed")
    (0 until killAt).foreach { b => srcB.addData(mkDocs(b)); qB.processAllAvailable() }
    qB.stop()
    dropCommit(chk("killed"), killAt - 1)
    qB = start(srcB, "killed")
    (killAt until batches).foreach { b => srcB.addData(mkDocs(b)); qB.processAllAvailable() }
    qB.stop()

    val twin = finalRows("twin")
    val killed = finalRows("killed")
    Result("domainGateMonitor/final-gate", batches, killAt, killed.length.toLong,
      twin.nonEmpty &&
        java.util.Arrays.equals(twin.asInstanceOf[Array[AnyRef]], killed.asInstanceOf[Array[AnyRef]]))
  }

  /** Kill-replay for the dup-gram-rate monitor: same worst-window drill
    * (offsets written, commit dropped, restart) — the final per-source
    * rates must equal the uninterrupted twin's. Replay determinism is
    * the Complete-mode aggregate's (counts are a pure function of the
    * replayed input) plus the rollup's (pure function of the counts).
    */
  def runDupGram(spark: SparkSession, batches: Int, perBatch: Int, killAt: Int): Result = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("restart-dupgram").toString

    // repeated phrases on a drifting modulus so dup rates move per batch
    def mkDocs(b: Int): Seq[(String, String)] =
      (0 until perBatch).map { i =>
        val src = s"s${i % 3}"
        val body =
          if ((i + b) % 4 == 0) "alpha beta gamma delta epsilon zeta eta theta"
          else s"uniq${b}x$i tokens roll ${i * 7} through window ${b + i} spread wide"
        (src, body)
      }

    def sink(name: String) = s"$root/$name/out"
    def chk(name: String) = s"$root/$name/chk"
    def start(src: MemoryStream[(String, String)], name: String) =
      DocStreams.dupGramRateMonitor(
        src.toDF().toDF("source", "text"), n = 5, chk(name),
        (rates, bid) => rates.withColumn("bid", lit(bid))
          .write.mode("append").parquet(sink(name)))

    def finalRows(name: String): Array[String] = {
      val df = spark.read.parquet(sink(name))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("bid").desc)
      sortedRows(df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn", "bid"))
    }

    val srcA = MemoryStream[(String, String)]
    val qA = start(srcA, "twin")
    (0 until batches).foreach { b => srcA.addData(mkDocs(b)); qA.processAllAvailable() }
    qA.stop()

    val srcB = MemoryStream[(String, String)]
    var qB = start(srcB, "killed")
    (0 until killAt).foreach { b => srcB.addData(mkDocs(b)); qB.processAllAvailable() }
    qB.stop()
    dropCommit(chk("killed"), killAt - 1)
    qB = start(srcB, "killed")
    (killAt until batches).foreach { b => srcB.addData(mkDocs(b)); qB.processAllAvailable() }
    qB.stop()

    val twin = finalRows("twin")
    val killed = finalRows("killed")
    Result("dupGramRateMonitor/final-rates", batches, killAt, killed.length.toLong,
      twin.nonEmpty &&
        java.util.Arrays.equals(twin.asInstanceOf[Array[AnyRef]], killed.asInstanceOf[Array[AnyRef]]))
  }

  /** windowedTopUsers through a parquet file sink, killed + replayed at
    * `killAt`, vs an uninterrupted twin.
    */
  def runTopUsers(spark: SparkSession, batches: Int, perBatch: Int, killAt: Int): Result = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("restart-topusers").toString

    def sink(name: String) = s"$root/$name/out"
    def chk(name: String) = s"$root/$name/chk"
    def start(src: MemoryStream[EventStreams.Event], name: String) =
      EventStreams.windowedTopUsers(src.toDF())
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink(name))
        .option("checkpointLocation", chk(name))
        .start()

    // uninterrupted twin
    val srcA = MemoryStream[EventStreams.Event]
    val qA = start(srcA, "twin")
    (0 until batches).foreach { b => srcA.addData(mkEvents(b, perBatch)); qA.processAllAvailable() }
    qA.stop()

    // killed + replayed run
    val srcB = MemoryStream[EventStreams.Event]
    var qB = start(srcB, "killed")
    (0 until killAt).foreach { b => srcB.addData(mkEvents(b, perBatch)); qB.processAllAvailable() }
    qB.stop()
    dropCommit(chk("killed"), killAt - 1) // crash window: offsets written, commit lost
    qB = start(srcB, "killed")
    (killAt until batches).foreach { b => srcB.addData(mkEvents(b, perBatch)); qB.processAllAvailable() }
    qB.stop()

    val twin = sortedRows(spark.read.parquet(sink("twin")))
    val killed = sortedRows(spark.read.parquet(sink("killed")))
    Result("windowedTopUsers/file-sink", batches, killAt, killed.length.toLong,
      java.util.Arrays.equals(twin.asInstanceOf[Array[AnyRef]], killed.asInstanceOf[Array[AnyRef]]))
  }

  /** nearDupIngest (stateful foreachBatch store), killed + replayed at
    * `killAt`, vs an uninterrupted twin. Driven the way its AvailableNow
    * trigger wants: a file-source feed with one run per arriving batch
    * file (every run is already a checkpoint restart); the kill deletes
    * the newest commit so the next run re-executes that batch's admit
    * decisions against the store before taking the new file.
    */
  def runNearDup(spark: SparkSession, batches: Int, perBatch: Int, killAt: Int): Result = {
    val root = java.nio.file.Files.createTempDirectory("restart-neardup").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))

    def writeFeed(srcDir: String, b: Int): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/b$b.json")
      (0 until perBatch).foreach { i =>
        val id = b.toLong * perBatch + i
        // every third doc repeats a cross-batch template, so admit
        // decisions genuinely depend on the store contents at replay time
        val text =
          if (i % 3 == 0) s"shared template body number ${i % 7} repeated across batches"
          else s"unique document $id body with words ${id * 31} and ${id * 17}"
        w.println(s"""{"doc_id": $id, "text": "$text"}""")
      }
      w.close()
    }

    def drive(name: String, injectKill: Boolean): Array[String] = {
      val srcDir = s"$root/$name/src"
      new java.io.File(srcDir).mkdirs()
      (0 until batches).foreach { b =>
        writeFeed(srcDir, b)
        val q = DocStreams.nearDupIngest(
          spark.readStream.schema(schema).json(srcDir),
          s"$root/$name/sink", s"$root/$name/store", s"$root/$name/chk",
          horizonBatches = Some(10L))
        require(q.awaitTermination(120000), s"nearDup batch $b exceeded 120 s")
        if (injectKill && b == killAt - 1) dropCommit(s"$root/$name/chk", b.toLong)
      }
      sortedRows(spark.read.parquet(s"$root/$name/sink").select(col("doc_id")))
    }

    val twin = drive("twin", injectKill = false)
    val killed = drive("killed", injectKill = true)
    Result("nearDupIngest/batch-dir-overwrite", batches, killAt, killed.length.toLong,
      java.util.Arrays.equals(twin.asInstanceOf[Array[AnyRef]], killed.asInstanceOf[Array[AnyRef]]))
  }

  /** Kill-replay for the decontamination-scrub ingest (byte-original
    * kernel): same drill as nearDup — feed a batch, drain with
    * AvailableNow, drop the newest commit at the kill point so the
    * restart replays it — under the batch_id=N overwrite discipline a
    * replayed batch overwrites its own partial output, so the killed
    * run's sink must equal the uninterrupted twin's row-for-row
    * (admission is a pure function of document + benchmark fingerprint
    * set: no state store, nothing to roll back). Every 4th doc embeds a
    * verbatim benchmark passage, so the replayed window contains real
    * scrub work, not just pass-throughs.
    */
  def runScrub(spark: SparkSession, batches: Int, perBatch: Int, killAt: Int): Result = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("restart-scrub").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))

    val benchPassage = "the benchmark answer is forty two and the question " +
      "remains unknown to every deep thought instance ever built"
    val benchFp = graft.ops.Dedup.winnowFingerprints(
        Seq((1L, benchPassage)).toDF("doc_id", "text"), "doc_id", "text", 5, 4)
      .select(col("gh")).distinct().cache()
    benchFp.count()

    def writeFeed(srcDir: String, b: Int): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/b$b.json")
      (0 until perBatch).foreach { i =>
        val id = b.toLong * perBatch + i
        val filler = s"ordinary corpus document $id talks about topic ${id % 23} " +
          s"with detail ${id * 31 % 101} and more detail ${id * 17 % 89}"
        val text =
          if (i % 4 == 0) s"Intro for doc $id. $benchPassage Outro ${id % 11}."
          else filler
        w.println(s"""{"doc_id": $id, "text": "$text"}""")
      }
      w.close()
    }

    def drive(name: String, injectKill: Boolean): Array[String] = {
      val srcDir = s"$root/$name/src"
      new java.io.File(srcDir).mkdirs()
      (0 until batches).foreach { b =>
        writeFeed(srcDir, b)
        val q = DocStreams.scrubIngest(
          spark.readStream.schema(schema).json(srcDir),
          benchFp, s"$root/$name/sink", s"$root/$name/chk",
          byteOriginal = true)
        require(q.awaitTermination(120000), s"scrub batch $b exceeded 120 s")
        if (injectKill && b == killAt - 1) dropCommit(s"$root/$name/chk", b.toLong)
      }
      sortedRows(spark.read.parquet(s"$root/$name/sink"))
    }

    val twin = drive("twin", injectKill = false)
    val killed = drive("killed", injectKill = true)
    val scrubbedDocs = spark.read.parquet(s"$root/killed/sink")
      .filter(col("tokens_removed") > 0).count()
    Result("scrubIngest/batch-dir-overwrite", batches, killAt, killed.length.toLong,
      scrubbedDocs > 0 &&
        java.util.Arrays.equals(twin.asInstanceOf[Array[AnyRef]], killed.asInstanceOf[Array[AnyRef]]))
  }

  /** Kill-replay for the ANN serving stream (annServeIngest): queries
    * arrive as a file feed, one AvailableNow run per batch file (the
    * nearDupIngest drive pattern — every run is already a checkpoint
    * restart, so this also soaks the index-artifact reload path:
    * centroids train ONCE into the AnnModels store and every subsequent
    * run serves the persisted table). The kill drops the newest commit
    * so the next run replays that batch's serve against its
    * `batch_id=N` overwrite dir; the final sink must be row-identical
    * to the uninterrupted twin — top-k answers are a pure function of
    * (index artifact, query batch), and the artifact is pinned by the
    * store.
    */
  def runAnnServe(
      spark: SparkSession, sfDir: String, batches: Int, perBatch: Int, killAt: Int): Result = {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("restart-annserve").toString
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1).map(_._2)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(FloatType))))

    def writeFeed(srcDir: String, b: Int): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/b$b.json")
      (0 until perBatch).foreach { i =>
        val qid = 1000000L + b.toLong * perBatch + i
        val v = vecs(((b * perBatch + i) % vecs.length).toInt)
        w.println(s"""{"vec_id": $qid, "v": [${v.mkString(", ")}]}""")
      }
      w.close()
    }

    def drive(name: String, injectKill: Boolean): Array[String] = {
      val srcDir = s"$root/$name/src"
      new java.io.File(srcDir).mkdirs()
      (0 until batches).foreach { b =>
        writeFeed(srcDir, b)
        val q = graft.streaming.AnnStreams.annServeIngest(
          spark.readStream.schema(schema).json(srcDir), corpus, sfDir,
          s"$root/$name/sink", s"$root/$name/chk",
          k = 10, dim = 64, nprobe = 3)
        require(q.awaitTermination(120000), s"annServe batch $b exceeded 120 s")
        if (injectKill && b == killAt - 1) dropCommit(s"$root/$name/chk", b.toLong)
      }
      sortedRows(spark.read.parquet(s"$root/$name/sink"))
    }

    val twin = drive("twin", injectKill = false)
    val killed = drive("killed", injectKill = true)
    Result("annServeIngest/store-reload", batches, killAt, killed.length.toLong,
      twin.nonEmpty &&
        java.util.Arrays.equals(twin.asInstanceOf[Array[AnyRef]], killed.asInstanceOf[Array[AnyRef]]))
  }

  /** Kill-replay for the COMPOSED PQ serving profile (annServeIngest
    * with ServeProfile = PqRerank — the x112 layout: lists carry PQ
    * reconstructions, candidates PQ-score, top R re-rank exactly): same
    * drive as runAnnServe, so every run also soaks the store-reload
    * path for BOTH persisted artifacts (IVF centroids AND the PQ
    * codebooks — trained once, table reads on all later runs). The
    * killed run's sink must be row-identical to the uninterrupted
    * twin's: answers are a pure function of (index artifacts, query
    * batch) under the batch_id=N overwrite discipline.
    */
  def runAnnServePq(
      spark: SparkSession, sfDir: String, batches: Int, perBatch: Int, killAt: Int): Result = {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("restart-annservepq").toString
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("v"))
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1).map(_._2)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(FloatType))))

    def writeFeed(srcDir: String, b: Int): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/b$b.json")
      (0 until perBatch).foreach { i =>
        val qid = 2000000L + b.toLong * perBatch + i
        val v = vecs(((b * perBatch + i * 7 + 3) % vecs.length).toInt)
        w.println(s"""{"vec_id": $qid, "v": [${v.mkString(", ")}]}""")
      }
      w.close()
    }

    def drive(name: String, injectKill: Boolean): Array[String] = {
      val srcDir = s"$root/$name/src"
      new java.io.File(srcDir).mkdirs()
      (0 until batches).foreach { b =>
        writeFeed(srcDir, b)
        val q = graft.streaming.AnnStreams.annServeIngest(
          spark.readStream.schema(schema).json(srcDir), corpus, sfDir,
          s"$root/$name/sink", s"$root/$name/chk",
          k = 10, dim = 64, nprobe = 3,
          profile = graft.streaming.AnnStreams.PqRerank(
            m = 4, subDim = 16, codebookK = 8, rerankR = 50))
        require(q.awaitTermination(180000), s"annServePq batch $b exceeded 180 s")
        if (injectKill && b == killAt - 1) dropCommit(s"$root/$name/chk", b.toLong)
      }
      sortedRows(spark.read.parquet(s"$root/$name/sink"))
    }

    val twin = drive("twin", injectKill = false)
    val killed = drive("killed", injectKill = true)
    Result("annServeIngest-pq/store-reload", batches, killAt, killed.length.toLong,
      twin.nonEmpty &&
        java.util.Arrays.equals(twin.asInstanceOf[Array[AnyRef]], killed.asInstanceOf[Array[AnyRef]]))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val batches = args.headOption.map(_.toInt).getOrElse(40)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(20000)
    val killAt = args.lift(2).map(_.toInt).getOrElse(batches / 2)
    val results = Seq(
      runTopUsers(spark, batches, perBatch, killAt),
      runNearDup(spark, batches, perBatch / 10, killAt),
      runMix(spark, batches, perBatch, killAt),
      runDomainGate(spark, batches, perBatch / 10, killAt),
      runScrub(spark, batches, perBatch / 10, killAt),
      runAnnServe(spark, args.lift(3).getOrElse("/root/testdata/sf0.1"),
        batches, perBatch / 100, killAt),
      runAnnServePq(spark, args.lift(3).getOrElse("/root/testdata/sf0.1"),
        batches, perBatch / 100, killAt))
    println(f"${"probe"}%-36s ${"batches"}%7s ${"killAt"}%6s ${"rows"}%8s ${"agree"}%6s")
    results.foreach(r =>
      println(f"${r.probe}%-36s ${r.batches}%7d ${r.killAt}%6d ${r.rows}%8d ${r.agree}%6s"))
    require(results.forall(_.agree), "post-restart output diverged from the uninterrupted twin")
    spark.stop()
  }
}
