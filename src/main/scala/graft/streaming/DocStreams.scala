package graft.streaming

import graft.ops.{Dedup, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document ingest — the unbounded form of the batch curation
  * queries (x02 quality gate, x03 exact dedup): documents arrive on a feed
  * (crawl output, upload queue) and are quality-scored, language-guessed,
  * and exactly-deduplicated before landing in the training corpus.
  *
  * Scale posture: the quality/language stage is map-only (stateless,
  * codegen'd — identical plan to the batch x01/x02 path). Dedup state is the
  * content hash only (16 bytes/doc, never the text), keyed and checkpointed,
  * and `dropDuplicatesWithinWatermark` EVICTS hashes older than the
  * watermark — bounded state on an unbounded feed. That buys at-least-
  * exactly-once *within the dedup horizon*: a duplicate arriving later than
  * the watermark delay is admitted (and left for the periodic batch x03
  * sweep), which is the standard horizon/compaction split for corpus dedup
  * at 100 TB/day ingest rates.
  */
object DocStreams {

  /** Map-only curation columns — reused verbatim from the batch operators
    * so stream and batch score identically (same codegen'd expressions).
    */
  def withCuration(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("content_hash", Dedup.contentKey(col(textCol)))
      .withColumn("lang_guess", TextOps.langGuess(col(textCol)))
      .withColumn("quality", TextOps.quality(col(textCol)))

  /** Full ingest pipeline: curate -> quality gate -> exact dedup within the
    * watermark horizon. Emits admitted documents in append mode.
    */
  def ingest(
      docs: DataFrame,
      tsCol: String = "ts",
      textCol: String = "text",
      minQuality: Double = 0.5,
      watermark: String = "1 hour"): DataFrame =
    withCuration(docs, textCol)
      .filter(col("quality") >= minQuality)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
