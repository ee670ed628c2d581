package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once folding of a batch into a partitioned directory
  * layout under foreachBatch's at-least-once replay — the protocol
  * shared by the ANN bucketed layout ([[graft.ext.Similarity
  * .appendBucketedIdempotent]]) and the IVF-PQ code layout
  * ([[graft.ext.Clustering]]'s streaming leg). All control paths are
  * `_`-prefixed, so partition discovery never sees them:
  *
  *  1. a committed-epoch marker `_epochs/<epoch>` short-circuits a
  *     fully-applied replay;
  *  2. the batch stages under `_staging/epoch=<epoch>` with
  *     mode(Overwrite) — re-staging is idempotent;
  *  3. any `epoch-<epoch>-*` files a crashed earlier attempt already
  *     moved into the staged partitions are DELETED (the caller's
  *     partitioning must be deterministic, so replays stage the
  *     identical partition set), then the staged files move in under
  *     deterministic `epoch-<epoch>-<i>` names;
  *  4. the marker commits.
  *
  * A crash at any step leaves a state the replay repairs to the exact
  * single-application layout. Concurrent external readers can observe
  * a mid-move torn epoch (inherent to multi-file commit on a plain
  * filesystem); streaming loops are sequential per query. */
object IdempotentAppend {

  /** Returns false if the epoch was already committed (no-op). `rows`
    * must contain `partitionCol`; values must be deterministic
    * functions of the batch content. */
  def append(spark: SparkSession, root: String, rows: DataFrame,
             partitionCol: String, epoch: Long): Boolean = {
    import org.apache.hadoop.fs.Path
    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(rootP, s"_epochs/$epoch")
    if (fs.exists(marker)) return false // epoch already committed
    val staging = new Path(rootP, s"_staging/epoch=$epoch")
    rows.write.mode("overwrite").partitionBy(partitionCol)
      .parquet(staging.toString)
    val staged = fs.listStatus(staging).filter(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
    for (p <- staged) {
      val dest = new Path(rootP, p.getPath.getName)
      fs.mkdirs(dest)
      // clear a crashed attempt's partial move of THIS epoch first —
      // part-file counts may differ between attempts, so skipping
      // name collisions alone could mix two attempts' files
      fs.listStatus(dest)
        .filter(_.getPath.getName.startsWith(s"epoch-$epoch-"))
        .foreach(f => fs.delete(f.getPath, false))
      val files = fs.listStatus(p.getPath)
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        .sortBy(_.getPath.getName)
      files.zipWithIndex.foreach { case (f, i) =>
        fs.rename(f.getPath, new Path(dest, s"epoch-$epoch-$i.parquet"))
      }
    }
    fs.delete(new Path(rootP, "_staging"), true)
    fs.mkdirs(marker)
    true
  }
}
