package graft.ext

import org.apache.spark.sql.SparkSession

/** Crash-safe rewrite for catalog tables — the table-catalog twin of
  * Clustering's `compactCodesDir` (r12 advice): the canonical rows
  * land in a `${table}__compacting` staging table FIRST, then a
  * DROP + RENAME swaps the staging table into place. The live table
  * is never the input of its own overwrite, so no failure window
  * leaves localCheckpoint blocks as the only copy of an index.
  *
  * Failure windows, in order: (a) crash while writing the staging
  * table — the live table is untouched, the next run drops the
  * leftover; (b) crash between the DROP and the RENAME — the
  * COMPLETE staging table is on disk, and a replay renames it into
  * place on entry (recovery-first, r13 advice) before dropping
  * anything; (c) crash after the RENAME — done. */
private[ext] object TableSwaps {

  /** RECOVERY-FIRST entry check (r13 advice), shared by [[swapInTable]]
    * and exposed so multi-table callers (compactInvertedIndex reads
    * all four tables before its first swap) can heal window (b) for
    * EVERY table before touching any of them. A staging location is
    * torn garbage ONLY while the live location still exists (window
    * (a)); live gone + staging present is window (b), where the
    * staging copy is the sole complete copy and must be renamed in
    * before any delete can reach it.
    *
    * Same-JVM replay (the staging table still registered): the swap
    * completes via catalog ALTER RENAME — the catalog moves the
    * warehouse directory itself and the bucket spec survives.
    * Post-crash JVM (empty in-memory catalog, both locations on
    * disk): the files move first, then the location re-registers as
    * an external parquet table — readable and correct, though the
    * bucket spec is not recoverable from files alone (the next
    * compaction rewrites it bucketed). */
  def recoverTable(spark: SparkSession, table: String): Unit = {
    val staging = s"${table}__compacting"
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveLoc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val stagLoc = new org.apache.hadoop.fs.Path(warehouse, staging.toLowerCase)
    if (!fs.exists(liveLoc) && fs.exists(stagLoc)) {
      if (spark.catalog.tableExists(staging)) {
        spark.sql(s"DROP TABLE IF EXISTS $table") // stale entry, if any
        spark.sql(s"ALTER TABLE $staging RENAME TO $table")
      } else {
        require(fs.rename(stagLoc, liveLoc),
          s"swap recovery failed: $stagLoc -> $liveLoc " +
            s"(copy intact at $stagLoc)")
        spark.sql(s"DROP TABLE IF EXISTS $table")
        spark.sql(
          s"CREATE TABLE $table USING parquet LOCATION '${liveLoc.toString}'")
      }
    }
  }

  /** Stage-only half of [[swapInTable]]: heal window (b) for THIS
    * table, clear any torn staging leftovers, and write the canonical
    * rows into `${table}__compacting`. The live table is untouched —
    * so staging writes for SEVERAL tables may safely overlap (guide
    * §2.6; compactInvertedIndex runs its four staging writes from a
    * driver pool), while each swap itself stays a sequential
    * [[commitSwap]] so at most ONE table ever sits in the DROP→RENAME
    * recovery window at a time. */
  def stageTable(spark: SparkSession, table: String)(
      write: String => Unit): Unit = {
    recoverTable(spark, table)
    val staging = s"${table}__compacting"
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagLoc = new org.apache.hadoop.fs.Path(warehouse, staging.toLowerCase)
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    // orphaned managed staging location from a previous JVM (files
    // survive, the in-memory catalog does not) would refuse the CREATE
    if (fs.exists(stagLoc)) fs.delete(stagLoc, true)
    write(staging)
  }

  /** Swap half of [[swapInTable]]: DROP the live table and RENAME the
    * complete staging copy into place (windows (b)/(c) above). */
  def commitSwap(spark: SparkSession, table: String): Unit = {
    val staging = s"${table}__compacting"
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveLoc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a cross-JVM-recovered `table` is external — its DROP leaves the
    // files, and an orphaned live location would collide with the
    // RENAME's directory move
    if (fs.exists(liveLoc)) fs.delete(liveLoc, true)
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
  }

  def swapInTable(spark: SparkSession, table: String)(
      write: String => Unit): Unit = {
    stageTable(spark, table)(write)
    commitSwap(spark, table)
  }
}
