package graft.streaming

import java.sql.Timestamp

import graft.SparkTest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming document ingest: quality gate + exact dedup within the
  * watermark horizon (streaming twins of batch x02/x03).
  */
class DocStreamsSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val prose =
    "the cat and the dog sat in the sun and the rain came to the field of green grass"
  private val junk = "@@@ ### !!! %% ^^ && ** (( ))"

  test("ingest: quality gate drops junk; duplicate within the horizon admitted once") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStreams.ingest(in.toDF(), minQuality = 0.3, watermark = "1 hour")
      .writeStream.format("memory").queryName("ingested").outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Doc(1, ts("2024-01-01 10:00:00"), prose),
        Doc(2, ts("2024-01-01 10:01:00"), junk), // fails the quality gate
        Doc(3, ts("2024-01-01 10:02:00"), prose)) // exact duplicate of doc 1
      q.processAllAvailable()
      in.addData(Doc(4, ts("2024-01-01 10:30:00"), prose)) // still within horizon
      q.processAllAvailable()
      val admitted = spark.table("ingested").select("doc_id").as[Long].collect().toSet
      admitted shouldBe Set(1L)
    } finally q.stop()
  }

  test("sourceDriftMonitor: streamed counts agree exactly with the batch SQL path") {
    import graft.ops.{CorpusMix, TextOps}
    import org.apache.spark.sql.functions.{col, count, explode, lit, pmod}
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source"), col("text")).as[(String, String)].collect().toSeq
    // reference = the whole corpus's own distribution (batch SQL path)
    val corpusCounts = new Array[Long](CorpusMix.Buckets)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .select(pmod(TextOps.polyHash(col("tok")), lit(CorpusMix.Buckets.toLong)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .collect().foreach(r => corpusCounts(r.getLong(0).toInt) = r.getLong(1))
    val reference = CorpusMix.smoothed(corpusCounts)

    val in = MemoryStream[(String, String)]
    val q = DocStreams.sourceDriftMonitor(in.toDF().toDF("source", "text"), reference)
      .writeStream.format("memory").queryName("drift").outputMode(OutputMode.Update()).start()
    try {
      // three triggers, ragged split — state must accumulate across them
      val (a, rest) = docs.splitAt(docs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
      // last emission per source = the full-corpus state
      val last = spark.table("drift").as[(String, Long, Double)].collect()
        .zipWithIndex.groupBy(_._1._1).map { case (_, rows) => rows.maxBy(_._2)._1 }
      // batch twin: per-source counts via the SQL expression path, scored
      // with the same scalar jsVsReference
      val batchCounts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
        .select(col("source"),
          pmod(TextOps.polyHash(col("tok")), lit(CorpusMix.Buckets.toLong)).as("bucket"))
        .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("c"))
        .collect().groupBy(_.getString(0)).map { case (src, rows) =>
          val arr = new Array[Long](CorpusMix.Buckets)
          rows.foreach(r => arr(r.getLong(1).toInt) = r.getLong(2))
          src -> arr
        }
      last.map(_._1).toSet shouldBe batchCounts.keySet
      last.foreach { case (src, n, js) =>
        val exp = batchCounts(src)
        n shouldBe exp.sum
        js shouldBe CorpusMix.jsVsReference(exp, reference) // exact double equality
      }
      // a source distributed exactly like the reference would score 0; real
      // sources differ from the pooled corpus, so drift is strictly positive
      last.foreach { case (_, _, js) => js should be > 0.0 }
    } finally q.stop()
  }

  test("sourceDriftMonitor: js is zero iff the source matches the reference exactly") {
    import graft.ops.CorpusMix
    implicit val sq = spark.sqlContext
    // long texts: with add-one smoothing over 256 buckets, a handful of
    // tokens is 97% smoothing mass and every distribution looks uniform —
    // the drift signal needs token counts well above the bucket count
    val text = "alpha beta gamma delta epsilon zeta " * 500
    val reference = CorpusMix.smoothed(CorpusMix.bucketCounts(text))
    val in = MemoryStream[(String, String)]
    val q = DocStreams.sourceDriftMonitor(in.toDF().toDF("source", "text"), reference)
      .writeStream.format("memory").queryName("drift0").outputMode(OutputMode.Update()).start()
    try {
      in.addData(("same", text), ("other", "omega psi chi phi upsilon tau " * 500))
      q.processAllAvailable()
      val js = spark.table("drift0").as[(String, Long, Double)].collect()
        .map(r => r._1 -> r._3).toMap
      js("same") shouldBe 0.0     // own-distribution reference: zero drift
      js("other") should be > 0.1 // disjoint vocabulary: real drift
    } finally q.stop()
  }

  test("temperatureMixMonitor: every trigger apportions the full budget; final equals batch x63") {
    import graft.ops.CorpusMix
    import org.apache.spark.sql.functions.{col, count, lit}
    implicit val sq = spark.sqlContext
    val sources = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("source")).as[String].collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("mix-monitor").toString
    val in = MemoryStream[String]
    val q = DocStreams.temperatureMixMonitor(
      in.toDF().toDF("source"), alpha = 0.3, budget = 100000L, s"$root/chk",
      (alloc, bid) => alloc.withColumn("bid", lit(bid))
        .write.mode("append").parquet(s"$root/out"))
    try {
      // three ragged triggers — counts must accumulate across them
      val (a, rest) = sources.splitAt(sources.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.read.parquet(s"$root/out").cache()
    // the budget apportions EXACTLY at every trigger, not just the last —
    // the largest-remainder kernel's invariant holds on partial counts
    val perTrigger = out.groupBy(col("bid"))
      .agg(org.apache.spark.sql.functions.sum(col("alloc")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perTrigger.size shouldBe 3
    perTrigger.values.foreach(_ shouldBe 100000L)
    // final trigger = batch x63 over the same documents, row-identical
    val lastBid = perTrigger.keys.max
    val streamed = out.filter(col("bid") === lastBid)
      .select(col("source"), col("n_docs"), col("w"), col("alloc"))
      .collect().map(_.toString).sorted
    val batch = CorpusMix.temperatureAllocation(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs")),
      alpha = 0.3, budget = 100000L)
      .collect().map(_.toString).sorted
    streamed shouldBe batch
    out.unpersist(false)
  }

  test("domainGateMonitor: exact-regime final trigger equals the batch twin; blocklist bites") {
    import graft.ops.{TextOps, UrlOps}
    import org.apache.spark.sql.functions._
    implicit val sq = spark.sqlContext
    // fixture docs synthesized with messy urls over four registrable
    // domains (one multi-label suffix, one blocklisted), duplicate canon
    // urls planted via the id residue
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
      .select(col("doc_id"), col("text"), concat(
        lit("https://"),
        when(col("doc_id") % 2 === 0, lit("www.")).otherwise(lit("news.")),
        when(col("doc_id") % 7 === 0, lit("badactor.net"))
          .when(col("doc_id") % 11 === 0, lit("m.acme.ck")) // PSL wildcard *.ck
          .when(col("doc_id") % 3 === 0, lit("acme.co.uk"))
          .when(col("doc_id") % 3 === 1, lit("acme.com"))
          .otherwise(lit("other.com")),
        lit("/p/"), (col("doc_id") % 9).cast("string"),
        when(col("doc_id") % 5 === 0, lit("?utm_source=x&a=1")).otherwise(lit("?a=1")))
        .as("url"))
      .cache()
    val rows = base.select(col("url"), col("text")).as[(String, String)].collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("domain-monitor").toString
    val in = MemoryStream[(String, String)]
    val q = DocStreams.domainGateMonitor(
      in.toDF().toDF("url", "text"), blocklist = Seq("badactor.net"),
      checkpointPath = s"$root/chk",
      onTrigger = (t, bid) => t.withColumn("bid", lit(bid))
        .write.mode("append").parquet(s"$root/out"),
      k = 1024, qualityFloor = 0.4)
    try {
      val (a, b) = rows.splitAt(rows.size / 2)
      Seq(a, b).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.read.parquet(s"$root/out").cache()
    val lastBid = out.agg(max(col("bid"))).head.getLong(0)
    val streamed = out.filter(col("bid") === lastBid).drop("bid")
      .collect().map(_.toString).sorted
    // batch twin with EXACT countDistinct — k=1024 far exceeds any
    // domain's distinct canon urls, so the sketch count is exact and the
    // emitted table must be row-identical
    val (canon, host) = UrlOps.canonCols(col("url"))
    val batch = base.select(
        UrlOps.registrableDomain(host).as("domain"), canon.as("canon"),
        TextOps.quality(col("text")).as("qq"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon")).cast("double").as("n_urls"),
        (sum(col("qq").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as("mean_quality"))
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_urls") / col("n_docs").cast("double"), 6))
      .withColumn("blocked", when(col("domain") === "badactor.net", 1).otherwise(0))
      .withColumn("keep",
        (col("blocked") === 0 && col("mean_quality") >= 0.4).cast("int"))
      .select("domain", "n_docs", "n_urls", "mean_quality", "dup_rate", "blocked", "keep")
      .collect().map(_.toString).sorted
    streamed shouldBe batch
    // the gate actually fires: the planted bad domain is blocked+dropped,
    // the multi-label suffix produced a 3-label registrable domain, and
    // duplicate canon urls produced a positive dup rate somewhere
    val byDomain = out.filter(col("bid") === lastBid)
      .collect().map(r => r.getAs[String]("domain") -> r).toMap
    byDomain("badactor.net").getAs[Int]("blocked") shouldBe 1
    byDomain("badactor.net").getAs[Int]("keep") shouldBe 0
    byDomain.keySet should contain("acme.co.uk")
    // the streaming path rides the real PSL: under wildcard *.ck the
    // registrable domain keeps the label BEFORE the suffix, so hosts
    // www.m.acme.ck / news.m.acme.ck both key as m.acme.ck
    byDomain.keySet should contain("m.acme.ck")
    byDomain.values.map(_.getAs[Double]("dup_rate")).max should be > 0.0
    out.unpersist(false); base.unpersist(false)
  }

  test("dupGramRateMonitor: final trigger equals the batch bucket twin; conservative vs exact") {
    import graft.ops.TextOps
    import org.apache.spark.sql.functions.{col, count, explode, lit, round, sum, when}
    implicit val sq = spark.sqlContext
    // planted verbatim duplicates on a modulus coprime to the fixture's
    // source period (the x79 discipline) so EVERY source's true dup rate
    // is off zero
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val docs = base.union(
      base.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id") + 900000, col("source"), col("text")))
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val root = java.nio.file.Files.createTempDirectory("dupgram-monitor").toString
    val in = MemoryStream[(String, String)]
    val q = DocStreams.dupGramRateMonitor(
      in.toDF().toDF("source", "text"), n = 5, s"$root/chk",
      (rates, bid) => rates.withColumn("bid", lit(bid))
        .write.mode("append").parquet(s"$root/out"))
    try {
      val (a, rest) = docs.splitAt(docs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    val out = spark.read.parquet(s"$root/out").cache()
    val lastBid = out.agg(org.apache.spark.sql.functions.max(col("bid"))).head.getLong(0)
    val streamed = out.filter(col("bid") === lastBid)
      .select(col("source"), col("n_positions"), col("n_dup_positions"), col("dup_rate"))
      .collect().map(_.toString).sorted
    // batch bucket twin over the same documents — row-identical
    val staticDocs = docs.toDF("source", "text")
    val twin = DocStreams.dupGramRollup(
      DocStreams.dupGramBucketCounts(staticDocs, n = 5))
      .collect().map(_.toString).sorted
    streamed shouldBe twin
    // conservative bracket: the bucket rate can only OVERestimate the
    // exact gram-level rate (collisions add dup positions, never hide)
    val pos = staticDocs.select(col("source"),
      explode(TextOps.positionalGramHashes(col("text"), 5)).as("gh"))
    val gc = pos.groupBy(col("gh")).agg(count(lit(1)).as("gn"))
    val exact = pos.join(gc, "gh").groupBy(col("source"))
      .agg((sum(when(col("gn") > 1, 1L).otherwise(0L)).cast("double")
        / count(lit(1)).cast("double")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bucketRates = out.filter(col("bid") === lastBid)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("dup_rate")).toMap
    exact.foreach { case (s, r) =>
      bucketRates(s) should be >= r - 1e-9
      r should be > 0.0 // the plant is visible in the exact rate
    }
    out.unpersist(false)
  }

  test("qualityCalibrationMonitor: streamed cut equals the batch histogram twin; within 1e-3 of exact") {
    import graft.ops.TextOps
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val docs = docsDf.select(col("source"), col("text")).as[(String, String)].collect().toSeq
    val in = MemoryStream[(String, String)]
    val q = DocStreams.qualityCalibrationMonitor(in.toDF().toDF("source", "text"))
      .writeStream.format("memory").queryName("calib")
      .outputMode(OutputMode.Update()).start()
    try {
      val (a, rest) = docs.splitAt(docs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      Seq(a, b, c).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    } finally q.stop()
    val last = spark.table("calib").as[(String, Long, Double)].collect()
      .zipWithIndex.groupBy(_._1._1).map { case (_, rows) => rows.maxBy(_._2)._1 }

    // batch twin: identical clamped-histogram cut, computed driver-side
    // from per-(source, quality) values scored by the SAME expression
    val scored = docsDf
      .select(col("source"), TextOps.quality(col("text")).as("q"))
      .as[(String, Double)].collect().toSeq
    val bySource = scored.groupBy(_._1)
    last.size shouldBe bySource.size
    last.foreach { case (src, n, est) =>
      val qs = bySource(src).map(_._2).sorted
      n shouldBe qs.size
      val bins = qs.map(v => math.min(DocStreams.CalibBuckets - 1,
        math.max(0, math.floor(v * DocStreams.CalibBuckets).toInt)))
      val target = math.ceil(0.2 * qs.size).toLong
      var cum = 0L
      val expectBin = bins.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
        .collectFirst { case (bin, cnt) if { cum += cnt; cum >= target } => bin }.get
      est shouldBe expectBin.toDouble / DocStreams.CalibBuckets // exact twin agreement
      // and the histogram estimate brackets the EXACT bottom-20% quantile
      // within one bucket width (the monitor's documented error bound)
      val exact = qs((target - 1).toInt)
      est should be <= exact
      exact should be < est + 1.0 / DocStreams.CalibBuckets
    }
  }

  test("decontaminateIngest: planted benchmark leakage quarantines at the door; replay idempotent") {
    import org.apache.spark.sql.functions.{col, explode}
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("decontam").toString
    // benchmark = two "eval" prompts; feed = clean prose + one doc
    // containing an eval prompt verbatim + one short doc (no 5-grams)
    val bench = Seq(
      "what is the capital of france and spain",
      "name the longest river on the african continent").toDF("text")
      .select(explode(graft.ops.Dedup.shingles(col("text"), 5)).as("shingle"))
    val feed = Seq(
      (1L, prose),
      (2L, "intro words then what is the capital of france and spain trailing text"),
      (3L, "too short"),
      (4L, prose + " extra tail tokens here"))
    val in = MemoryStream[(Long, String)]
    // enqueue BEFORE start: AvailableNow snapshots offsets at start, so
    // data added after can lose the race and the one-shot query
    // terminates having processed nothing (observed ~1/60 suite runs)
    in.addData(feed)
    val q = DocStreams.decontaminateIngest(
      in.toDF().toDF("doc_id", "text"), bench,
      s"$root/sink", s"$root/quarantine", s"$root/chk")
    q.processAllAvailable(); q.awaitTermination(60000)
    def ids(p: String): Set[Long] =
      spark.read.parquet(p).select("doc_id").collect().map(_.getLong(0)).toSet
    ids(s"$root/sink") shouldBe Set(1L, 3L, 4L)
    ids(s"$root/quarantine") shouldBe Set(2L)
    // the quarantined doc reports real containment over ITS shingles
    val row = spark.read.parquet(s"$root/quarantine").collect().head
    row.getAs[Long]("n_hits") should be > 0L
    row.getAs[Double]("containment") should (be > 0.0 and be <= 1.0)
    // replay idempotence: a second run over the same feed (fresh
    // checkpoint, same batch ids) overwrites to the identical output
    val in2 = MemoryStream[(Long, String)]
    in2.addData(feed)
    val q2 = DocStreams.decontaminateIngest(
      in2.toDF().toDF("doc_id", "text"), bench,
      s"$root/sink", s"$root/quarantine", s"$root/chk2")
    q2.processAllAvailable(); q2.awaitTermination(60000)
    ids(s"$root/sink") shouldBe Set(1L, 3L, 4L)
    ids(s"$root/quarantine") shouldBe Set(2L)
  }

  test("fuzzyDecontaminateIngest: mutated leakage the exact gate misses quarantines; replay idempotent") {
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("fuzzydecon").toString
    val n = 5; val w = 4
    // one 30-token benchmark item, fingerprinted once (MB-scale set ->
    // bounded broadcast)
    val promptToks = (0 until 30).map(i => s"evaltok$i")
    val prompt = promptToks.mkString(" ")
    val benchFp = graft.ops.Dedup.winnowFingerprints(
      Seq((1L, prompt)).toDF("bench_id", "text"), "bench_id", "text", n, w)
    // mutated plant: every 10th prompt token replaced (x95's MutEvery
    // regime — intact runs of 9 >= w + n - 1 = 8 keep shared
    // fingerprints inside every run)
    val mutToks = promptToks.zipWithIndex.map { case (t, i) =>
      if (i % 10 == 0) s"zzmut$i" else t }
    val mutated = "intro words here " + mutToks.mkString(" ") + " tail words here"
    val verbatim = "intro words here " + prompt + " tail words here"
    val feed = Seq((1L, prose), (2L, verbatim), (3L, mutated), (4L, "too short"))
    val in = MemoryStream[(Long, String)]
    in.addData(feed) // before start — the AvailableNow snapshot race
    val q = DocStreams.fuzzyDecontaminateIngest(
      in.toDF().toDF("doc_id", "text"), benchFp,
      s"$root/sink", s"$root/quarantine", s"$root/chk", n = n, w = w)
    q.processAllAvailable(); q.awaitTermination(60000)
    def ids(p: String): Set[Long] =
      spark.read.parquet(p).select("doc_id").collect().map(_.getLong(0)).toSet
    ids(s"$root/sink") shouldBe Set(1L, 4L)
    ids(s"$root/quarantine") shouldBe Set(2L, 3L)
    // the REASON this twin exists: the exact verbatim-threshold gate
    // misses the mutated plant (its 5-gram containment is far below a
    // 0.8 verbatim floor) while the fuzzy gate catches it
    val exact = DocStreams.decontaminationScores(
        Seq((3L, mutated)).toDF("doc_id", "text"),
        Seq(prompt).toDF("text")
          .select(org.apache.spark.sql.functions.explode(
            graft.ops.Dedup.shingles(col("text"), n)).as("shingle")))
      .collect().head.getAs[Double]("containment")
    exact should be < 0.8
    val fuzzy = spark.read.parquet(s"$root/quarantine")
      .filter(col("doc_id") === 3L).collect().head
    fuzzy.getAs[Double]("containment") should be >= 0.3
    // stream == batch twin: the emitted scores are exactly the batch
    // kernel's over the same documents
    val batch = DocStreams.fuzzyDecontaminationScores(
        feed.toDF("doc_id", "text"), benchFp, n = n, w = w)
      .collect().map(_.toString).sorted
    val streamed =
      (spark.read.parquet(s"$root/sink").drop("batch_id").collect() ++
        spark.read.parquet(s"$root/quarantine").drop("batch_id").collect())
        .map(_.toString).sorted
    streamed shouldBe batch
    // replay idempotence (fresh checkpoint, same batch ids)
    val in2 = MemoryStream[(Long, String)]
    in2.addData(feed)
    val q2 = DocStreams.fuzzyDecontaminateIngest(
      in2.toDF().toDF("doc_id", "text"), benchFp,
      s"$root/sink", s"$root/quarantine", s"$root/chk2", n = n, w = w)
    q2.processAllAvailable(); q2.awaitTermination(60000)
    ids(s"$root/sink") shouldBe Set(1L, 4L)
    ids(s"$root/quarantine") shouldBe Set(2L, 3L)
  }

  test("scrubIngest: leaked spans are cut at the door, clean docs pass byte-original; replay idempotent") {
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scrubingest").toString
    val n = 5; val w = 4
    val promptToks = (0 until 30).map(i => s"evaltok$i")
    val prompt = promptToks.mkString(" ")
    val benchFp = graft.ops.Dedup.winnowFingerprints(
      Seq((1L, prompt)).toDF("bench_id", "text"), "bench_id", "text", n, w)
    // doc 2 embeds the prompt between per-doc-unique flanks; doc 1 is
    // clean prose with MixedCase preserved (the pass-through check)
    val flanksA = (0 until 12).map(i => s"fa$i").mkString(" ")
    val flanksB = (0 until 12).map(i => s"fb$i").mkString(" ")
    val leaky = flanksA + " " + prompt + " " + flanksB
    val cleanOrig = "The Quick Brown Fox kept ITS case intact here today"
    val feed = Seq((1L, cleanOrig), (2L, leaky))
    val in = MemoryStream[(Long, String)]
    in.addData(feed) // before start — the AvailableNow snapshot race
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val q = DocStreams.scrubIngest(
      in.toDF().toDF("doc_id", "text"), benchFp,
      s"$root/sink", s"$root/chk", n = n, w = w)
    q.processAllAvailable(); q.awaitTermination(60000)
    // storage hygiene: foreachBatch unpersists each batch's checked-spans
    // cut once written, so the stream leaves NO new persisted RDDs behind
    // (a long-running scrub stream must not accumulate one generation per
    // micro-batch until driver GC)
    (spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore) shouldBe empty
    val out = spark.read.parquet(s"$root/sink").drop("batch_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.keySet shouldBe Set(1L, 2L)
    // clean doc: byte-original text, zero audit counts
    out(1L).getAs[String]("text") shouldBe cleanOrig
    out(1L).getAs[Long]("n_spans") shouldBe 0L
    out(1L).getAs[Long]("tokens_removed") shouldBe 0L
    // leaky doc: the prompt is gone, the flanks survive, counts add up
    val scrubbed = out(2L).getAs[String]("text")
    scrubbed should not include "evaltok5"
    scrubbed should include("fa0")
    scrubbed should include("fb11")
    out(2L).getAs[Long]("n_spans") shouldBe 1L
    out(2L).getAs[Long]("n_tokens") shouldBe 54L // 12 + 30 + 12
    out(2L).getAs[Long]("tokens_removed") should be >= 30L - (w - 1).toLong
    // the scrubbed doc re-sweeps clean against the same benchmark
    graft.ops.Dedup.fingerprintSpansAgainst(
      Seq((2L, scrubbed)).toDF("doc_id", "text"), benchFp,
      "doc_id", "text", n, w, mergeGap = 11, minFp = 2L).count() shouldBe 0L
    // stream == batch kernel row-identically
    val batch = DocStreams.scrubBatch(feed.toDF("doc_id", "text"), benchFp, n = n, w = w)
      .collect().map(_.toString).sorted
    spark.read.parquet(s"$root/sink").drop("batch_id")
      .collect().map(_.toString).sorted shouldBe batch
    // replay idempotence
    val in2 = MemoryStream[(Long, String)]
    in2.addData(feed)
    val q2 = DocStreams.scrubIngest(
      in2.toDF().toDF("doc_id", "text"), benchFp,
      s"$root/sink", s"$root/chk2", n = n, w = w)
    q2.processAllAvailable(); q2.awaitTermination(60000)
    spark.read.parquet(s"$root/sink").drop("batch_id")
      .collect().map(_.toString).sorted shouldBe batch
  }

  test("scrubIngest byteOriginal: kept bytes survive with casing/punctuation intact") {
    import org.apache.spark.sql.functions.col
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scrubbytes").toString
    val n = 5; val w = 4
    val prompt = (0 until 30).map(i => s"evaltok$i").mkString(" ")
    val benchFp = graft.ops.Dedup.winnowFingerprints(
      Seq((1L, prompt)).toDF("bench_id", "text"), "bench_id", "text", n, w)
    // MixedCase, punctuation, and a double space in the kept flanks —
    // exactly what the lowercased-token kernel cannot preserve
    val leaky = s"Intro, with CASE!  kept bytes aa bb cc dd $prompt Outro; done."
    val feed = Seq((1L, leaky))
    val in = MemoryStream[(Long, String)]
    in.addData(feed) // before start — the AvailableNow snapshot race
    val q = DocStreams.scrubIngest(
      in.toDF().toDF("doc_id", "text"), benchFp,
      s"$root/sink", s"$root/chk", n = n, w = w, byteOriginal = true)
    q.processAllAvailable(); q.awaitTermination(60000)
    val out = spark.read.parquet(s"$root/sink").collect().head
    val scrubbed = out.getAs[String]("text")
    scrubbed should startWith("Intro, with CASE!  kept bytes")
    scrubbed should not include "evaltok5"
    scrubbed should endWith("done.")
    // common-selection floor: interior windows agree on both sides, so
    // the span covers at least tokens [p+w-1, p+22+n-1] of the 30-token
    // prompt
    out.getAs[Long]("tokens_removed") should be >= 24L
    // stream == batch kernel in byte mode too
    val batch = DocStreams.scrubBatch(
        feed.toDF("doc_id", "text"), benchFp, n = n, w = w, byteOriginal = true)
      .collect().map(_.toString).sorted
    spark.read.parquet(s"$root/sink").drop("batch_id")
      .collect().map(_.toString).sorted shouldBe batch
  }

  test("withCuration matches the batch scoring exactly (same expressions, stream or batch)") {
    val batch = Seq((1L, prose), (2L, junk)).toDF("doc_id", "text")
    val out = DocStreams.withCuration(batch).orderBy("doc_id").collect()
    out(0).getAs[String]("lang_guess") shouldBe "en"
    out(0).getAs[Double]("quality") should be > 0.3
    out(1).getAs[Double]("quality") should be < 0.3
    out(0).getAs[String]("content_hash") should have length 32
  }

  test("nearDupIngest: LSH store drops near-dups across batches; replay is exactly-once") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-neardup").toString
    val srcDir = s"$root/src"; new java.io.File(srcDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/$name")
      rows.foreach { case (id, t) => w.println(s"""{"doc_id": $id, "text": "$t"}""") }
      w.close()
    }
    val baseText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def run(): Unit = {
      val q = DocStreams.nearDupIngest(
        spark.readStream.schema(schema).json(srcDir),
        s"$root/sink", s"$root/store", s"$root/chk")
      q.awaitTermination(60000)
    }

    // Batch 1: doc 1 unique, doc 2 = doc 1 (in-batch near-dup, first wins),
    // doc 3 unrelated, doc 4 too short to shingle (admitted, never banded).
    writeBatch("b1.json", Seq(
      (1L, baseText), (2L, baseText),
      (3L, "completely different words about maritime navigation charts and coastal tides"),
      (4L, "too short")))
    run()
    val after1 = spark.read.parquet(s"$root/sink").select("doc_id").as[Long].collect().toSet
    after1 shouldBe Set(1L, 3L, 4L)

    // Batch 2: doc 5 near-dups the STORED doc 1 -> dropped; doc 6 is new.
    writeBatch("b2.json", Seq(
      (5L, baseText),
      (6L, "fresh topic entirely about orbital mechanics and satellite constellations tonight")))
    run()
    val after2 = spark.read.parquet(s"$root/sink").select("doc_id").as[Long].collect().toSet
    after2 shouldBe Set(1L, 3L, 4L, 6L)

    // Replay batch 1 (drop its commit marker + crc sidecar): its own stored
    // band keys must not make it drop itself; sink unchanged.
    new java.io.File(s"$root/chk/commits").listFiles()
      .filter(f => f.getName == "1" || f.getName.startsWith(".1."))
      .foreach(_.delete())
    run()
    val after3 = spark.read.parquet(s"$root/sink").select("doc_id").as[Long].collect().toSet
    after3 shouldBe Set(1L, 3L, 4L, 6L)
  }

  test("compactStore: admissions identical across a compaction boundary; horizon evicts") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-neardup-compact").toString
    val srcDir = s"$root/src"; new java.io.File(srcDir).mkdirs()
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      val w = new java.io.PrintWriter(s"$srcDir/$name")
      rows.foreach { case (id, t) => w.println(s"""{"doc_id": $id, "text": "$t"}""") }
      w.close()
    }
    val baseText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    def run(): Unit = {
      val q = DocStreams.nearDupIngest(
        spark.readStream.schema(schema).json(srcDir),
        s"$root/sink", s"$root/store", s"$root/chk")
      q.awaitTermination(60000)
    }
    def sinkIds(): Set[Long] =
      spark.read.parquet(s"$root/sink").select("doc_id").as[Long].collect().toSet

    writeBatch("b1.json", Seq((1L, baseText),
      (3L, "completely different words about maritime navigation charts and coastal tides")))
    run() // batch 0
    writeBatch("b2.json", Seq(
      (6L, "fresh topic entirely about orbital mechanics and satellite constellations tonight")))
    run() // batch 1
    DocStreams.storeSegments(spark, s"$root/store") shouldBe Seq(0L, 1L)

    // Compact batches 0..1 (both durably committed) into one segment.
    DocStreams.compactStore(spark, s"$root/store", upToBatchId = 1L)
    DocStreams.storeSegments(spark, s"$root/store") shouldBe Seq(1L)

    // Batch 2 AFTER compaction: doc 7 near-dups doc 1 whose keys now live
    // only in the compacted segment -> still dropped; doc 8 admitted.
    writeBatch("b3.json", Seq((7L, baseText),
      (8L, "novel subject on glacier cores and isotope ratios measured last winter")))
    run() // batch 2
    sinkIds() shouldBe Set(1L, 3L, 6L, 8L)
    // Replay batch 2 ACROSS the compaction boundary: identical admissions.
    new java.io.File(s"$root/chk/commits").listFiles()
      .filter(f => f.getName == "2" || f.getName.startsWith(".2."))
      .foreach(_.delete())
    run()
    sinkIds() shouldBe Set(1L, 3L, 6L, 8L)

    // Horizon eviction: drop keys older than batch 2. The evicted doc-1
    // keys stop gating admission, so a late duplicate is re-admitted —
    // the watermark-eviction semantics of `ingest`, on disk.
    DocStreams.compactStore(spark, s"$root/store", upToBatchId = 2L, evictBeforeBatchId = 2L)
    DocStreams.storeSegments(spark, s"$root/store") shouldBe Seq(2L)
    writeBatch("b4.json", Seq((9L, baseText)))
    run() // batch 3
    sinkIds() shouldBe Set(1L, 3L, 6L, 8L, 9L)
  }

  test("scrubPii: admitted stream carries redacted text + counts; dedup still sees the original") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = DocStreams.ingest(in.toDF(), minQuality = 0.2, scrubPii = true)
      .writeStream.format("memory").queryName("scrubbed").outputMode(OutputMode.Append()).start()
    try {
      val withPii = prose + " contact user1@example.com or call 555-0042"
      in.addData(
        Doc(1, ts("2024-01-01 10:00:00"), withPii),
        Doc(2, ts("2024-01-01 10:01:00"), withPii)) // exact dup of the ORIGINAL text
      q.processAllAvailable()
      val rows = spark.table("scrubbed").orderBy("doc_id").collect()
      rows.length shouldBe 1 // dedup keyed on the pre-scrub content hash
      val r = rows.head
      r.getAs[String]("text") should include("[EMAIL]")
      r.getAs[String]("text") should include("[PHONE]")
      r.getAs[String]("text") should not include "@example.com"
      r.getAs[Long]("n_emails") shouldBe 1L
      r.getAs[Long]("n_phones") shouldBe 1L
      // identical expressions to the batch x18 path
      val batch = Seq((1L, withPii)).toDF("doc_id", "text")
        .select(graft.ops.TextOps.scrubPii(org.apache.spark.sql.functions.col("text"))).head().getString(0)
      r.getAs[String]("text") shouldBe batch
    } finally q.stop()
  }

  test("packIngest: streaming packing equals the batch cumsum binning across micro-batches") {
    import DocStreams.{PackDoc, PackedDoc}
    implicit val sq = spark.sqlContext
    val in = MemoryStream[PackDoc]
    val q = DocStreams.packIngest(in.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("pack").outputMode(OutputMode.Append()).start()
    val streamed =
      try {
        in.addData(PackDoc("a", 1, 40), PackDoc("a", 2, 50), PackDoc("b", 1, 90))
        q.processAllAvailable()
        // second micro-batch: state carries each source's running offset
        in.addData(PackDoc("a", 3, 30), PackDoc("a", 4, 50), PackDoc("b", 2, 30))
        q.processAllAvailable()
        spark.table("pack").as[PackedDoc].collect()
          .map(p => (p.source, p.doc_id) -> p.bin).toMap
      } finally q.stop()
    // a4: cum_before = 120 -> bin 1 (crossed the budget across batches)
    streamed(("a", 4L)) shouldBe 1L
    streamed(("a", 3L)) shouldBe 0L
    // batch twin: x20's window-cumsum binning over the union, same order
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val all = Seq(("a", 1L, 40L), ("a", 2L, 50L), ("a", 3L, 30L), ("a", 4L, 50L),
      ("b", 1L, 90L), ("b", 2L, 30L)).toDF("source", "doc_id", "tok")
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    val batch = all
      .withColumn("bin", floor((sum($"tok").over(w) - $"tok") / 100.0).cast("long"))
      .select($"source", $"doc_id", $"bin").as[(String, Long, Long)].collect()
      .map { case (s, d, b) => (s, d) -> b }.toMap
    streamed shouldBe batch
  }

  test("ingest state is the content hash only — admitted schema carries curation columns") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Doc]
    val df = DocStreams.ingest(in.toDF(), minQuality = 0.3)
    df.columns.toSeq should contain allOf ("doc_id", "ts", "text", "content_hash", "lang_guess", "quality")
  }
}
