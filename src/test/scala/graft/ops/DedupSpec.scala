package graft.ops

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Dedup family semantics: exact groups, shingling, Jaccard, MinHash
  * signatures + LSH candidates, SimHash Hamming behavior.
  */
class DedupSpec extends AnyFunSuite with Matchers with SparkTest {
  import spark.implicits._

  private def randText(seed: Int, words: Int = 60): String = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
    val rnd = new scala.util.Random(seed)
    Seq.fill(words)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  test("exactDupGroups finds identical texts and keeps the smallest id") {
    val df = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "unique one"),
      (4L, "same text"), (5L, "another unique")).toDF("doc_id", "text")
    val out = Dedup.exactDupGroups(df, "text", "doc_id").collect()
    out.length shouldBe 1
    out.head.getAs[Long]("keep_id") shouldBe 1L
    out.head.getAs[Long]("copies") shouldBe 3L
  }

  test("shingles: distinct word 3-grams; short docs yield empty sets") {
    val df = Seq("the quick brown fox jumps", "a b", "").toDF("text")
    val out = df.select(Dedup.shingles(col("text")).as("s"))
      .collect().map(_.getSeq[String](0).toSet)
    out(0) shouldBe Set("the quick brown", "quick brown fox", "brown fox jumps")
    out(1) shouldBe Set.empty
    out(2) shouldBe Set.empty
  }

  test("jaccard: identity 1.0, disjoint 0.0") {
    val df = Seq(
      ("x y z a b c", "x y z a b c"), // identical
      ("p q r s t u", "v w aa bb cc dd")) // disjoint shingles
      .toDF("t1", "t2")
      .select(Dedup.jaccard(Dedup.shingles(col("t1")), Dedup.shingles(col("t2"))).as("j"))
    val js = df.as[Double].collect()
    js(0) shouldBe 1.0 +- 1e-12
    js(1) shouldBe 0.0 +- 1e-12
  }

  test("minhash signatures: equal for identical docs, mostly differ for unrelated docs") {
    val docs = Seq(
      (1L, randText(1)), (2L, randText(1)), (3L, randText(99))).toDF("doc_id", "text")
    val sig = docs.select(
      col("doc_id") +: (0 until Dedup.MinHashK).map(i =>
        Dedup.minhashComponent(Dedup.shingleHashes(col("text")), i).as(s"mh$i")): _*)
      .orderBy("doc_id").collect()
    (0 until Dedup.MinHashK).foreach { i =>
      sig(0).getLong(i + 1) shouldBe sig(1).getLong(i + 1) // identical docs
    }
    val agree = (0 until Dedup.MinHashK).count(i => sig(0).getLong(i + 1) == sig(2).getLong(i + 1))
    agree should be < Dedup.MinHashK // unrelated docs must not share the full signature
  }

  test("LSH candidates recover planted near-duplicates") {
    val base = (0L until 40L).map(i => (i, randText(i.toInt, 80)))
    val planted = base.filter(_._1 % 4 == 0).map { case (i, t) => (i + 1000, t + " tail") }
    val corpus = (base ++ planted).toDF("doc_id", "text")
    val sigs = corpus.select(
      col("doc_id") +: (0 until Dedup.MinHashK).map(i =>
        Dedup.minhashComponent(Dedup.shingleHashes(col("text")), i).as(s"mh$i")): _*)
    val cands = Dedup.lshCandidates(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wanted = base.filter(_._1 % 4 == 0).map { case (i, _) => (i, i + 1000) }.toSet
    // High-similarity pairs (J ~ 0.95) should nearly all collide in >=1 of 4 bands.
    (wanted.intersect(cands).size.toDouble / wanted.size) should be >= 0.8
  }

  test("lshCandidates: oversized buckets are dropped (hot-key guard), default cap inert") {
    val base = (0L until 40L).map(i => (i, randText(i.toInt, 80)))
    val planted = base.filter(_._1 % 4 == 0).map { case (i, t) => (i + 1000, t + " tail") }
    val corpus = (base ++ planted).toDF("doc_id", "text")
    val sigs = corpus.select(
      col("doc_id") +: (0 until Dedup.MinHashK).map(i =>
        Dedup.minhashComponent(Dedup.shingleHashes(col("text")), i).as(s"mh$i")): _*)
    // A cap of 1 drops every bucket (any candidate-producing bucket has >= 2 members).
    Dedup.lshCandidates(sigs, "doc_id", maxBucket = 1).count() shouldBe 0L
    // The default cap (1000) sits far above any fixture bucket: results identical.
    Dedup.lshCandidates(sigs, "doc_id").collect().toSet shouldBe
      Dedup.lshCandidates(sigs, "doc_id", maxBucket = Int.MaxValue).collect().toSet
  }

  test("suggestWidths maps corpus stats to measured probe-table rows") {
    // fixture scale (SURVEY §8 probe: 6,667 docs, ~25% planted dups) ->
    // the measured 8/4/2 default
    Dedup.suggestWidths(Dedup.CorpusStats(6667L, 0.25)) shouldBe ((8, 4, 2))
    // 100x corpus -> the precision-leaning 16/4/4 row (same recall class,
    // ~2.4x less candidate shuffle)
    Dedup.suggestWidths(Dedup.CorpusStats(666700L, 0.25)) shouldBe ((16, 4, 4))
    // small corpus, rare dups -> the recall-max 16/8/2 row
    Dedup.suggestWidths(Dedup.CorpusStats(10000L, 0.001)) shouldBe ((16, 8, 2))
    // size precedence: a huge corpus stays precision-leaning even for rare dups
    Dedup.suggestWidths(Dedup.CorpusStats(1000000000L, 0.001)) shouldBe ((16, 4, 4))
    an[IllegalArgumentException] should be thrownBy
      Dedup.suggestWidths(Dedup.CorpusStats(100L, 1.5))
  }

  test("native WordShingles/PolyHash agree with the composed HOF twins on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
      .select(col("doc_id"), col("text"))
    val cmp = docs.select(
      Dedup.shingles(col("text")).as("nat"),
      Dedup.shinglesComposed(col("text")).as("hof"),
      TextOps.polyHash(col("text")).as("nat_h"),
      TextOps.polyHashComposed(col("text")).as("hof_h"))
    cmp.filter(col("nat") =!= col("hof") || col("nat_h") =!= col("hof_h")).count() shouldBe 0L
    // edge cases: empty, whitespace-only, short docs
    val edge = Seq("", "   ", "one", "one two", "A  B\tC\nd").toDF("text").select(
      Dedup.shingles(col("text")).as("nat"),
      Dedup.shinglesComposed(col("text")).as("hof"),
      TextOps.polyHash(col("text")).as("nat_h"),
      TextOps.polyHashComposed(col("text")).as("hof_h"))
    edge.filter(col("nat") =!= col("hof") || col("nat_h") =!= col("hof_h")).count() shouldBe 0L
  }

  test("simhash64: near-dups close, unrelated ~32 bits apart, matches a reference fold") {
    // Disjoint vocabularies -> independent fingerprints (~32 bits apart);
    // fixture word-salad shares a vocab, which correlates simhashes, so the
    // unrelated pair is built from disjoint token sets deliberately.
    val disjointA = (0 until 80).map(i => s"alpha$i").mkString(" ")
    val disjointB = (0 until 80).map(i => s"beta$i").mkString(" ")
    val df = Seq(
      (randText(5, 100), randText(5, 100) + " tiny tail"),
      (disjointA, disjointB))
      .toDF("t1", "t2")
      .select(Dedup.hamming(Dedup.simhash64(col("t1")), Dedup.simhash64(col("t2"))).as("d"))
    val ds = df.as[Long].collect()
    ds(0) should be <= 8L
    ds(1) should be >= 16L // ~32 expected for independent 64-bit prints

    // Pin the exact semantics against an independent driver-side fold.
    def ref(text: String): Long = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val votes = new Array[Int](64)
      for (t <- toks; j <- 0 until 4) {
        var acc = ('a' + j).toLong
        t.foreach(c => acc = (acc * 31 + c.toLong) % 1000000007L)
        for (b <- 0 until 16)
          if (((acc >> b) & 1L) == 1L) votes(j * 16 + b) += 1 else votes(j * 16 + b) -= 1
      }
      (0 until 64).foldLeft(0L)((o, i) => if (votes(i) > 0) o | (1L << i) else o)
    }
    val sample = Seq("the quick brown fox", "", "  ", "one", randText(9, 40))
    val got = sample.toDF("text").select(Dedup.simhash64(col("text")).as("h")).as[Long].collect()
    got.toSeq shouldBe sample.map(ref)
  }

  test("simhash: hamming 0-ish for near-dups, large for unrelated") {
    val df = Seq(
      (randText(5, 100), randText(5, 100) + " tiny tail"),
      (randText(5, 100), randText(77, 100)))
      .toDF("t1", "t2")
      .select(Dedup.hamming(Dedup.simhash(col("t1")), Dedup.simhash(col("t2"))).as("d"))
    val ds = df.as[Long].collect()
    ds(0) should be <= 2L
    ds(1) should be >= 3L
  }

  test("exactSubstringSpans finds a planted cross-doc passage at its maximal extent") {
    val W = 8
    // passage: 12 unique tokens embedded at different offsets in two
    // otherwise-unrelated docs -> ONE maximal span of exactly 12 tokens,
    // chained from 12 - 8 + 1 = 5 overlapping window hits.
    // surroundings use per-doc-unique tokens so the shared run is EXACTLY
    // the passage (a chance token match flanking it would legitimately
    // extend the maximal span — the operator found that in a randText
    // draw)
    val passage = (0 until 12).map(i => s"shared$i").mkString(" ")
    val doc1 = (0 until 20).map(i => s"d1a$i").mkString(" ") + " " + passage + " " +
      (0 until 15).map(i => s"d1b$i").mkString(" ")
    val doc2 = (0 until 5).map(i => s"d2a$i").mkString(" ") + " " + passage + " " +
      (0 until 30).map(i => s"d2b$i").mkString(" ")
    val clean = randText(5, 40)
    val df = Seq((1L, doc1), (2L, doc2), (3L, clean)).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(df, "doc_id", "text", W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    spans.length shouldBe 1
    val (id1, id2, start1, start2, spanTokens, nWindows) = spans.head
    (id1, id2) shouldBe (1L, 2L)
    start1 shouldBe 20L // tokens before the passage in doc1
    start2 shouldBe 5L
    spanTokens shouldBe 12L
    nWindows shouldBe 5L
  }

  test("exactSubstringSpans: two disjoint shared passages yield two spans; short docs none") {
    val W = 6
    val pa = (0 until 7).map(i => s"pa$i").mkString(" ")
    val pb = (0 until 6).map(i => s"pb$i").mkString(" ")
    val doc1 = pa + " " + randText(11, 10) + " " + pb
    val doc2 = pb + " " + randText(12, 12) + " " + pa
    val tiny = "too short for any window"
    val df = Seq((1L, doc1), (2L, doc2), (9L, tiny)).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(df, "doc_id", "text", W)
      .orderBy(col("start1"))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    spans.toSeq shouldBe Seq(
      (0L, 18L, 7L),  // pa: doc1 offset 0, doc2 offset 6 + 12 = 18, maximal 7 tokens
      (17L, 0L, 6L))  // pb: doc1 offset 7 + 10 = 17, doc2 offset 0
  }

  /** Sequential all-pairs Jaccard reference for the prefix join. */
  private def jaccardRef(sets: Seq[(Long, Set[String])], t: Double): Set[(Long, Long, Double)] =
    (for {
      (i1, s1) <- sets if s1.nonEmpty
      (i2, s2) <- sets if s2.nonEmpty && i1 < i2
      o = (s1 intersect s2).size.toDouble
      jac = o / (s1.size + s2.size - o)
      if jac >= t
    } yield (i1, i2, jac)).toSet

  private def runPrefixJoin(sets: Seq[(Long, Seq[String])], t: Double): Set[(Long, Long, Double)] =
    Dedup.prefixSimilarityJoin(sets.toDF("doc_id", "s"), t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("prefixSimilarityJoin: exact agreement with all-pairs on random token sets") {
    val rnd = new scala.util.Random(23)
    val universe = (0 until 50).map(i => s"t$i")
    val sets = (0L until 80L).map { i =>
      i -> rnd.shuffle(universe).take(6 + rnd.nextInt(10)).toSeq
    }
    for (t <- Seq(0.3, 0.6, 0.9))
      runPrefixJoin(sets, t) shouldBe jaccardRef(sets.map { case (i, s) => i -> s.toSet }, t)
  }

  test("prefixSimilarityJoin: exact-boundary pair survives, t=1 keeps only identical sets") {
    // |x ∩ y| = 3, union 5 -> jac exactly 0.6: must be INCLUDED at t=0.6
    val sets = Seq(
      1L -> Seq("a", "b", "c", "d"), 2L -> Seq("a", "b", "c", "e"),
      3L -> Seq("a", "b", "c", "d"), 4L -> Seq("z"))
    runPrefixJoin(sets, 0.6).map { case (a, b, _) => (a, b) } shouldBe
      Set((1L, 2L), (1L, 3L), (2L, 3L))
    runPrefixJoin(sets, 1.0).map { case (a, b, _) => (a, b) } shouldBe Set((1L, 3L))
  }

  test("prefixSimilarityJoin: a universal hot token generates no candidates on its own") {
    // Every doc shares "the" but nothing else; the hot token is never among
    // a doc's rarest prefix tokens, so the exact result (empty at t=0.6)
    // arrives WITHOUT the C(n,2) shared-token candidate blowup a plain
    // token equi-join would produce — the no-cap scale claim, black-box.
    val sets = (0L until 40L).map(i => i -> Seq("the", s"u${i}a", s"u${i}b", s"u${i}c"))
    runPrefixJoin(sets, 0.6) shouldBe empty
  }

  test("prefixSimilarityJoin: empty sets drop, duplicates inside a set do not corrupt sizes") {
    val sets = Seq(
      1L -> Seq.empty[String],
      2L -> Seq("a", "b", "a", "a"),  // set semantics: {a, b}
      3L -> Seq("a", "b"))
    runPrefixJoin(sets, 0.5) shouldBe Set((2L, 3L, 1.0))
  }

  test("x76 cluster split: same cluster always lands in one split; naive coin WOULD have torn it") {
    val rows = graft.SparkEntry
      .queries("x76_cluster_split")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster"),
        r.getAs[String]("split"), r.getAs[Int]("torn")))
    // the leakage-safety invariant, by construction AND checked: every
    // member of a cluster shares the cluster's split
    rows.groupBy(_._2).values.foreach { members =>
      members.map(_._3).distinct should have size 1
    }
    // the planted near-dup clusters make the naive per-doc coin tear at
    // least one cluster apart — the leakage this operator prevents is
    // real on this corpus, not vacuous
    rows.map(_._4).sum should be > 0
    // torn only ever fires for docs that HAVE a cluster-mate (a
    // singleton's cluster coin IS its doc coin)
    val clusterSizes = rows.groupBy(_._2).view.mapValues(_.length).toMap
    rows.filter(_._4 == 1).foreach { r => clusterSizes(r._2) should be > 1 }
  }

  test("positional gram hashes: token-column form == raw-text form, grams hash the joined text") {
    // the perf refactor seam (materialized tokens vs inline tokenizer)
    // must be a pure rewrite — same values, every position, both orders
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta alpha beta gamma delta epsilon"),
      (2L, "  Mixed   CASE\ttokens  with  gaps  here  now  ok  "),
      (3L, "tiny one")).toDF("doc_id", "text")
    val viaText = docs.select(col("doc_id"),
      TextOps.positionalGramHashes(col("text"), 5).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaTokens = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), TextOps.positionalGramHashesOfTokens(col("tk"), 5).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    viaTokens shouldBe viaText
    // positional semantics: within-doc repeats hash identically at both
    // occurrences (doc 1 repeats 'alpha beta gamma delta epsilon' at
    // positions 0 and 6)
    viaTokens(1L).length shouldBe 7
    viaTokens(1L).distinct.length should be < 7
    viaTokens(1L).head shouldBe viaTokens(1L)(6)
    // under n tokens -> empty, not null
    viaTokens(3L) shouldBe Seq.empty
    // hashes equal the polyHash of the space-joined gram text
    val direct = docs.filter(col("doc_id") === 2L)
      .select(TextOps.polyHash(lit("mixed case tokens with gaps")).as("p"))
      .head.getLong(0)
    viaTokens(2L).head shouldBe direct
  }

  test("winnowing: every window covered, rightmost tie, match guarantee on shared runs") {
    val n = 3; val w = 4
    // doc 2 shares a 12-token run with doc 1 (>= w + n - 1 = 6 tokens),
    // embedded at a different offset — the winnowing guarantee says they
    // MUST share at least one fingerprint hash from inside the run
    val run = "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi"
    val d1 = s"${randText(11, 20)} $run ${randText(12, 8)}"
    val d2 = s"${randText(13, 5)} $run ${randText(14, 25)}"
    // doc 3 uses a disjoint vocabulary so its fingerprint hashes cannot
    // collide with doc 1's by chance
    val d3 = (0 until 40).map(i => s"uniq$i").mkString(" ")
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, "doc_id", "text", n, w)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    // coverage: every valid window start has a selected position inside
    // its window (the defining winnowing invariant) — gram counts
    // recomputed independently in plain Scala
    def nGramsOf(text: String): Int =
      text.trim.toLowerCase.split("\\s+").count(_.nonEmpty) - (n - 1)
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    Seq(1L -> d1, 2L -> d2, 3L -> d3).foreach { case (id, text) =>
      (0 to nGramsOf(text) - w).foreach { start =>
        assert((start until start + w).exists(byDoc(id).contains),
          s"doc $id window at $start has no fingerprint")
      }
    }
    // match guarantee: docs 1 and 2 share a fingerprint hash; doc 3 none
    val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
    val h3 = fp.filter(_._1 == 3L).map(_._3).toSet
    (h1 & h2) should not be empty
    (h1 & h3) shouldBe empty
    // rightmost tie-break: a doc of one repeated token has all-equal gram
    // hashes, so each window selects its LAST position — selected
    // positions are exactly {w-1, w, ..., nGrams-1}
    val rep = Seq((9L, Seq.fill(10)("echo").mkString(" "))).toDF("doc_id", "text")
    val repFp = Dedup.winnowFingerprints(rep, "doc_id", "text", n, w)
      .collect().map(_.getInt(1)).sorted
    val repGrams = 10 - (n - 1)
    repFp shouldBe (w - 1 until repGrams).toArray
    // density: fingerprints never exceed window count and land near the
    // 2/(w+1) expectation on random text
    val rand = Seq((7L, randText(21, 200))).toDF("doc_id", "text")
    val nfp = Dedup.winnowFingerprints(rand, "doc_id", "text", n, w).count().toDouble
    val windows = (200 - (n - 1)) - (w - 1)
    nfp should be <= windows.toDouble
    nfp / windows should be > 0.2
    nfp / windows should be < 0.6
  }

  test("fingerprintSpans localizes a planted passage to its token interval") {
    val n = 5; val w = 4; val gap = n + 2 * (w - 1)
    // 30 unique passage tokens at offset 20 in the bench doc, offset 0
    // in the train doc; surroundings per-doc-unique so the shared
    // content is EXACTLY the passage
    val passage = (0 until 30).map(i => s"shared$i").mkString(" ")
    val benchDoc = (0 until 20).map(i => s"ba$i").mkString(" ") + " " + passage +
      " " + (0 until 25).map(i => s"bb$i").mkString(" ")
    val bench = Seq((100L, benchDoc), (101L, randText(5, 60))).toDF("doc_id", "text")
    val train = Seq((1L, passage + " " + (0 until 40).map(i => s"ta$i").mkString(" ")),
      (2L, randText(99, 60))).toDF("doc_id", "text")
    val spans = Dedup.fingerprintSpans(bench, train, "doc_id", "text",
      n, w, gap, minFp = 2L, dfCap = 64L).collect()
    spans.length shouldBe 1
    val r = spans.head
    r.getAs[Long]("id") shouldBe 100L
    r.getAs[Long]("train_id") shouldBe 1L
    // winnow selection slack: the first selected gram can start up to
    // w - 1 grams into the passage, the last covers through its end
    val start = r.getAs[Long]("span_start")
    val end = r.getAs[Long]("span_end")
    start should be >= 20L
    start should be <= (20L + w - 1)
    end should be >= (20L + 30 - w.toLong)
    end should be <= (20L + 30 - 1)
    r.getAs[Long]("span_tokens") shouldBe (end - start + 1)
  }

  test("fingerprintSpans: mergeGap bridges an isolated edit, separates distinct passages") {
    val n = 5; val w = 4; val gap = n + 2 * (w - 1)
    val p1 = (0 until 24).map(i => s"pone$i")
    // one edited token mid-passage: intact runs of 11/12 tokens (>= w+n-1=8)
    val edited = (p1.take(12) :+ "zzedit") ++ p1.drop(13)
    val p2 = (0 until 20).map(i => s"ptwo$i").mkString(" ")
    // bench doc: edited copy of p1, then a LONG unique stretch, then p2
    val benchDoc = (edited.mkString(" ")) + " " +
      (0 until 40).map(i => s"bu$i").mkString(" ") + " " + p2
    val bench = Seq((200L, benchDoc)).toDF("doc_id", "text")
    val train = Seq((1L, p1.mkString(" ") + " " + p2)).toDF("doc_id", "text")
    val spans = Dedup.fingerprintSpans(bench, train, "doc_id", "text",
      n, w, gap, minFp = 2L, dfCap = 64L)
      .orderBy(col("span_start")).collect()
    // the edit is bridged (one span for p1, not two) and the unique
    // stretch is not (p2 is its own span)
    spans.length shouldBe 2
    spans(0).getAs[Long]("span_start") should be < 24L
    spans(1).getAs[Long]("span_start") should be >= 64L
  }

  test("fingerprintSpans: dfCap drops boilerplate fingerprints from the index") {
    val n = 5; val w = 4
    val boiler = (0 until 16).map(i => s"boil$i").mkString(" ")
    // the same boilerplate in 5 train docs -> with dfCap 4 it cannot
    // produce spans; a unique passage still can
    val uniq = (0 until 16).map(i => s"uniq$i").mkString(" ")
    val train = ((1L to 5L).map(i => (i, boiler + " " + randText(i.toInt, 30))) :+
      (9L, uniq + " " + randText(77, 30))).toDF("doc_id", "text")
    val bench = Seq((300L, boiler + " " + uniq)).toDF("doc_id", "text")
    val spans = Dedup.fingerprintSpans(bench, train, "doc_id", "text",
      n, w, n + 2 * (w - 1), minFp = 2L, dfCap = 4L).collect()
    spans.map(_.getAs[Long]("train_id")).toSet shouldBe Set(9L)
  }

  test("scrubSpansBytes preserves original bytes outside the cut spans") {
    // mixed case, punctuation, multi-space runs — everything the
    // lowercased-token rebuild (scrubSpans) cannot preserve
    val docs = Seq(
      (1L, "Aa  BB!  cc dd EE"), // span (1,2) cuts 'BB!  cc ' (seam ws)
      (2L, "  Lead ws kept"),    // no span rows -> not implicated, absent
      (3L, "One two three")      // span (0,2) cuts everything
    ).toDF("doc_id", "text")
    val spans = Seq((1L, 1L, 2L), (3L, 0L, 2L)).toDF("id", "s", "e")
    val out = Dedup.scrubSpansBytes(docs, spans, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    out.keySet shouldBe Set(1L, 3L) // implicated only
    val r1 = out(1L)
    r1.getAs[String]("clean_text") shouldBe "Aa  dd EE"
    r1.getAs[Long]("n_tokens") shouldBe 5L
    r1.getAs[Long]("tokens_removed") shouldBe 2L
    // 'BB!' (3) + '  ' (2) + 'cc' (2) + ' ' (1)
    r1.getAs[Long]("chars_removed") shouldBe 8L
    r1.getAs[Long]("n_spans") shouldBe 1L
    val r3 = out(3L)
    r3.getAs[String]("clean_text") shouldBe ""
    r3.getAs[Long]("tokens_removed") shouldBe 3L
    r3.getAs[Long]("chars_removed") shouldBe 13L
  }

  test("scrubSpansBytes keeps whitespace BEFORE a span and leading whitespace") {
    val docs = Seq((1L, "  aa \t bb  cc")).toDF("doc_id", "text")
    // span (1,1): cut 'bb' and its following ws run only
    val spans = Seq((1L, 1L, 1L)).toDF("id", "s", "e")
    val r = Dedup.scrubSpansBytes(docs, spans, "doc_id", "text").collect().head
    r.getAs[String]("clean_text") shouldBe "  aa \t cc"
    r.getAs[Long]("chars_removed") shouldBe 4L // 'bb' + '  '
  }

  test("spanCharOffsets locates spans in the original string") {
    val docs = Seq((1L, "Aa  BB!  cc dd EE")).toDF("doc_id", "text")
    val spans = Seq((1L, 1L, 2L), (1L, 4L, 4L)).toDF("id", "s", "e")
    val out = Dedup.spanCharOffsets(docs, spans, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("s"),
        r.getAs[Long]("char_start"), r.getAs[Long]("char_end"))).sorted
    out shouldBe Array((1L, 4L, 10L), (4L, 15L, 16L))
    // the offsets really address the span bytes
    "Aa  BB!  cc dd EE".substring(4, 11) shouldBe "BB!  cc"
    "Aa  BB!  cc dd EE".substring(15, 17) shouldBe "EE"
  }

  test("clusterReps: null-safe argmax — all-null cluster still elects a rep") {
    // cluster 10: mixed null/non-null -> non-null max wins, nulls ignored;
    // cluster 20: ALL quality null -> the min-id member must still be
    // elected (a plain === tie filter drops the whole cluster, the latent
    // engine/oracle divergence this guards);
    // cluster 30: tie at the max -> lower id wins.
    val labeled = Seq(
      (1L, 10L, Some(0.5)), (2L, 10L, None), (3L, 10L, Some(0.9)),
      (7L, 20L, Option.empty[Double]), (5L, 20L, Option.empty[Double]),
      (8L, 30L, Some(0.7)), (9L, 30L, Some(0.7))
    ).toDF("id", "cluster", "quality")
    val reps = Dedup.clusterReps(labeled).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("rep_id"))).sorted
    reps shouldBe Array((10L, 3L), (20L, 5L), (30L, 8L))
  }

  test("clusterRepsWeighted: fused rep+size pass equals clusterReps ⋈ sizes") {
    // Same fixture as the clusterReps test (null-safe argmax, all-null
    // cluster, max tie) — the round-20 fusion must elect identical reps
    // and carry the exact member count per cluster.
    val labeled = Seq(
      (1L, 10L, Some(0.5)), (2L, 10L, None), (3L, 10L, Some(0.9)),
      (7L, 20L, Option.empty[Double]), (5L, 20L, Option.empty[Double]),
      (8L, 30L, Some(0.7)), (9L, 30L, Some(0.7))
    ).toDF("id", "cluster", "quality")
    val fused = Dedup.clusterRepsWeighted(labeled).collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("weight"))).sorted
    fused shouldBe Array((10L, 3L, 3L), (20L, 5L, 2L), (30L, 8L, 2L))
    // and field-for-field against the unfused pair of aggregates
    val sizes = labeled.groupBy(col("cluster")).agg(count(lit(1)).as("weight"))
    val unfused = Dedup.clusterReps(labeled).join(sizes, "cluster").collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("weight"))).sorted
    fused shouldBe unfused
  }

  test("suggestWidthsMeasured: narrowest width meeting the p99 budget wins; widest as fallback") {
    val stats = Dedup.CorpusStats(nDocs = 50000L, dupRate = 0.1)
    val calib = Seq(
      Dedup.WidthCalibration(4, 0.40),
      Dedup.WidthCalibration(8, 0.20),
      Dedup.WidthCalibration(16, 0.10))
    // 8 meets the 0.25 default budget and is narrower than 16
    Dedup.suggestWidthsMeasured(stats, calib) shouldBe ((8, 4, 2))
    // tighter budget: only 16 qualifies
    Dedup.suggestWidthsMeasured(stats, calib, targetP99 = 0.12) shouldBe ((16, 8, 2))
    // nothing qualifies -> widest measured (least-wrong fallback)
    Dedup.suggestWidthsMeasured(stats, calib, targetP99 = 0.05) shouldBe ((16, 8, 2))
    // size precedence carries over from suggestWidths: big corpora take
    // the precision-leaning 4-rows-per-band split of the same width
    Dedup.suggestWidthsMeasured(stats.copy(nDocs = 200000L), calib) shouldBe ((8, 2, 4))
    an[IllegalArgumentException] should be thrownBy
      Dedup.suggestWidthsMeasured(stats, Seq.empty)
  }
}
