package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Train-once / read-many store for ANN index models (IVF k-means
  * centroids, PQ codebooks).
  *
  * At 100 TB an ANN model is a build artifact: trained once by an index
  * build step, persisted as a (tiny) table, and READ by every serving
  * query — retraining inside each query would replay the training DAG per
  * query and couple serving latency to training cost. This object is that
  * build step: `trainOrLoad` trains a model the first time a (dataset,
  * model) pair is seen, writes it to a parquet table under a
  * fingerprinted path, and afterwards serves the persisted table. Training
  * is deterministic ([[Similarity.kmeansCentroids]] /
  * [[Similarity.pqCodebooks]]: fixed seeds, decimal-quantized means), so
  * the persisted model is bit-identical to an in-query retrain — hashes
  * do not change, only where the work happens.
  *
  * Staleness: the store key includes a fingerprint of the source table's
  * parquet files (path, length, mtime). Regenerated fixtures get a new
  * fingerprint and therefore a fresh training run; a stale model can never
  * be served against new data. Reference analogue: the reference fetches
  * and caches its EPT catalog once, then serves lookups from the cached
  * frame (scripts/usgs_lidar.py:60-74) — same artifact-vs-query split.
  */
object AnnModels {

  /** Root for persisted models — outside the repo (models are build
    * artifacts, not source) and per-user-writable. Override with
    * GRAFT_MODEL_DIR (e.g. to a shared filesystem on a cluster).
    */
  private def modelRoot: String =
    sys.env.getOrElse("GRAFT_MODEL_DIR", "/tmp/graft_models")

  /** Cheap dataset fingerprint: hash of every part-file's (path, length,
    * mtime) under `dir`/`table`.parquet. Driver-side file stats only — no
    * Spark job; on object stores the same listing is one LIST call.
    */
  private[ops] def fingerprint(dir: String, table: String): String = {
    val root = new java.io.File(dir, s"$table.parquet")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val desc = walk(root).map(f => s"${f.getPath}:${f.length}:${f.lastModified}").mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5").digest(desc.getBytes("UTF-8"))
    md.take(8).map(b => f"$b%02x").mkString
  }

  private def modelPath(dir: String, table: String, name: String): java.io.File =
    new java.io.File(s"$modelRoot/${fingerprint(dir, table)}/$name")

  /** Serve `name` for the dataset at (`dir`, `table`): read the persisted
    * model if present (parquet `_SUCCESS` marker), else run `train`, write
    * it, and read it back. The read-back (rather than returning the
    * training frame) pins the serving plan to a plain parquet scan of a
    * model-sized table in BOTH branches — identical plans whether or not
    * this call trained.
    */
  def trainOrLoad(s: SparkSession, dir: String, table: String, name: String)(
      train: => DataFrame): DataFrame = {
    val path = modelPath(dir, table, name)
    val marker = new java.io.File(path, "_SUCCESS")
    if (!marker.isFile) {
      train.write.mode("overwrite").parquet(path.getPath)
    }
    s.read.parquet(path.getPath)
  }

  /** Trained IVF centroids for the embeddings table at `dir` (seeded from
    * vec_id < k, `iters` deterministic k-means rounds). Columns:
    * (cell_id, cv).
    */
  def ivfCentroids(
      s: SparkSession, dir: String, corpus: DataFrame, k: Int, iters: Int, dim: Int): DataFrame =
    trainOrLoad(s, dir, "embeddings", s"ivf_k${k}_i$iters") {
      import org.apache.spark.sql.functions.col
      Similarity.kmeansCentroids(corpus, corpus.filter(col("vec_id") < k), iters, dim)
    }

  /** Trained PQ codebooks for the embeddings table at `dir`. Columns:
    * (subspace, cell_id, cv).
    */
  def pqCodebooks(
      s: SparkSession, dir: String, corpus: DataFrame,
      m: Int, subDim: Int, k: Int, iters: Int): DataFrame =
    trainOrLoad(s, dir, "embeddings", s"pq_m${m}_k${k}_i$iters") {
      Similarity.pqCodebooks(corpus, m, subDim, k, iters)
    }
}
