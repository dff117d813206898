package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe data generator: replicates the big driver fixture tables
  * k times (ids offset per copy so keys stay unique) into a new sf dir.
  * Used to observe which plans hold at 10x before they meet a real
  * cluster — not a driver artifact.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    // Offset multiplier for chained scale-ups: replicating an ALREADY
    // replicated dir reuses the id ranges the first pass minted, so the
    // per-copy offsets must exceed the source's max key (e.g. sf10 ->
    // sf100 needs offsetScale=100; the x32 key-collision bug at sf1 was
    // exactly this class).
    val offsetScale = args.lift(3).map(_.toLong).getOrElse(1L)
    // "verbatim" (default) clones text unchanged — right for volume
    // scaling, but df-capped fingerprint operators (x74/x96/x100 class)
    // go DEGENERATE on it above ~10 copies: every content hash's
    // document frequency multiplies by k, blows the boilerplate cap,
    // and both engines agree on an empty result (0 = 0 certifies
    // nothing). "mutate" salts every MutStride-th token of each copy
    // i > 0 with a copy-index suffix: every n-gram window (n >=
    // MutStride) then contains a copy-specific token, so fingerprints
    // stay at the SOURCE corpus's document frequency while equal texts
    // remain equal WITHIN a copy (the salt depends only on copy index
    // and position, never on doc id) — dup structure per copy intact,
    // cross-copy df flat. Copy 0 is always the source verbatim.
    // Chained mutate runs compose: a stage-2 copy j re-salts the same
    // positions, so suffixes accumulate ("...zc3zc7") and every
    // (i, j) lineage stays distinct.
    val mode = args.lift(4).getOrElse("verbatim")
    require(mode == "verbatim" || mode == "mutate", s"bad mode $mode")
    // <= the scrub family's n-gram width (5), so a mutated token lands
    // in every fingerprint window
    val MutStride = 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String, idCols: Seq[String], offset: Long,
        saltTextCol: Option[String] = None): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      // Mutate mode's every-MutStride-th-token guarantee counts
      // single-space slots, so it holds only when slots == fingerprint
      // tokens: consecutive spaces, tabs, newlines, or edge spaces would
      // desynchronize the stride and silently re-open the df-cap
      // degeneracy this mode exists to close. Fail loudly instead
      // (fixture tool; the driver corpora are single-space word text).
      saltTextCol.filter(_ => mode == "mutate").foreach { tc =>
        val bad = base.filter(
          col(tc).rlike("  |[\\t\\n\\r]|^ | $")).count()
        require(bad == 0L,
          s"GenScale mutate: $bad $name rows have consecutive/non-space " +
            "whitespace or edge spaces; the stride-salt guarantee needs " +
            "single-space token text — use verbatim mode or pre-normalize")
      }
      val copies = (0 until k).map { i =>
        val shifted = idCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(i * offset))
        }
        saltTextCol.filter(_ => mode == "mutate" && i > 0) match {
          case Some(tc) =>
            shifted.withColumn(tc,
              array_join(
                transform(split(col(tc), " "),
                  (t, p) => when(t =!= "" &&
                      pmod(p, lit(MutStride)) === lit(MutStride - 1),
                    concat(t, lit("zc"), lit(i))).otherwise(t)),
                " "))
          case None => shifted
        }
      }
      copies.reduce(_ union _)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"$name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }
    // Facts replicated; dimension tables copied as-is.
    replicate("lineitem", Seq("l_orderkey"), 100000000L * offsetScale)
    replicate("orders", Seq("o_orderkey"), 100000000L * offsetScale)
    replicate("documents", Seq("doc_id"), 10000000L * offsetScale,
      saltTextCol = Some("text"))
    replicate("embeddings", Seq("vec_id"), 10000000L * offsetScale)
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    // events: replicated like the other facts so the event-time family
    // (sessionize, session windows, attribution, burst dedup) scales too.
    // Each copy shifts BOTH ids — event_id for uniqueness, user_id so the
    // copies are disjoint user populations with identical streams (the
    // realistic scale axis for event data: more users, same per-user
    // activity). ts passes through untouched in whatever encoding the
    // source fixture carries (ns-long, NTZ, LTZ) — Tables.events
    // normalizes at read time.
    replicate("events", Seq("event_id", "user_id"), 100000000L * offsetScale)
    spark.stop()
  }
}
