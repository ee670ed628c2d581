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
  * COMPLETE staging table is on disk (recover by renaming it);
  * (c) crash after the RENAME — done. */
private[ext] object TableSwaps {
  def swapInTable(spark: SparkSession, table: String)(
      write: String => Unit): Unit = {
    val staging = s"${table}__compacting"
    spark.sql(s"DROP TABLE IF EXISTS $staging")
    // orphaned managed location from a previous JVM (files survive,
    // the in-memory catalog does not) would refuse the CREATE
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), staging.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    write(staging)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
  }
}
