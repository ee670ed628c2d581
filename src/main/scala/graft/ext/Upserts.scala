package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension (type 2) merge — the versioned-upsert
 * primitive a lakehouse dimension pipeline runs per batch (north-star
 * extension; the reference's `set_vertex_property` is the point-mutation
 * cousin, `props.PropertyOps.setVertexProperty`).
 *
 * Contract: `current` carries the history (`valid_from`, `valid_to`
 * NULL = open, `is_current`); `updates` carries the batch's new
 * attribute values per key. Keys whose compared attributes changed get
 * their open row closed at `batchTs` and a new open row inserted;
 * no-op updates pass through untouched; unseen keys insert as new open
 * rows.
 *
 * Scale: one inner join (changed detection), one semi + one anti join
 * on the same key — all co-partitioned on the dimension key, so AQE
 * plans a single shuffle of each side. NULL-safe comparison (`<=>`)
 * keeps NULL attribute transitions honest.
 */
object Upserts {

  def scd2(current: DataFrame, updates: DataFrame, keyCol: String,
           compareCols: Seq[String], batchTs: Column): DataFrame = {
    require(compareCols.nonEmpty, "scd2: need at least one compared column")
    val attrs = keyCol +: compareCols
    val upd = updates.select(attrs.map(col): _*)
    val open = current.filter(col("is_current"))
    val closedHistory = current.filter(!col("is_current"))
    // keys whose open row differs from the update on any compared col
    // the (small) changed-key set drives one semi and two anti joins:
    // materialize it once instead of re-running the change-detection
    // join per consumer
    val changedKeys = open.alias("o").join(upd.alias("u"), Seq(keyCol))
      .where(compareCols.map(c => !(col(s"o.$c") <=> col(s"u.$c")))
        .reduce(_ || _))
      .select(col(keyCol))
      .localCheckpoint()
    val closedOut = open.join(changedKeys, Seq(keyCol), "left_semi")
      .withColumn("valid_to", batchTs.cast("date"))
      .withColumn("is_current", lit(false))
    val unchanged = open.join(changedKeys, Seq(keyCol), "left_anti")
    val freshKeys = upd.join(open, Seq(keyCol), "left_anti")
    val inserts = upd.join(changedKeys, Seq(keyCol), "left_semi")
      .unionByName(freshKeys)
      .withColumn("valid_from", batchTs.cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
      .select(current.columns.map(col): _*)
    closedHistory.unionByName(closedOut).unionByName(unchanged)
      .unionByName(inserts)
  }
}
