package graft.streaming

import graft.ops.CatalogOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming catalog construction — the Structured Streaming upgrade of the
  * reference's batch fetch loop (`fetch_metadata`,
  * `scripts/usgs_lidar.py:245-276`), per SURVEY.md §2.8: resources arrive
  * as (prefix, body-JSON) rows on an unbounded feed; every micro-batch runs
  * the same buildCatalog projection (regex name/year + EPT bounds parse)
  * and appends to the catalog sink.
  *
  * vs the reference: no per-row HTTP + whole-file rewrite (O(n^2), K2) —
  * each batch is parsed in parallel and appended once, and a restart
  * resumes from the checkpoint instead of refetching 1,597 resources.
  */
object CatalogStream {

  /** Wire a streaming (prefix, body) frame through buildCatalog into an
    * append-mode parquet sink. Caller starts with `.start()` semantics via
    * the returned query handle.
    */
  def build(
      eptMetaStream: DataFrame,
      sinkPath: String,
      checkpointPath: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    eptMetaStream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CatalogOps.buildCatalog(batch)
          .write.mode("append").parquet(sinkPath)
      }
      .start()
}
