package graft.props

import graft.model.OnionGraph
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Property-column operations: dictionary encode/decode, labels, point
 * lookups and (immutable) point mutation.
 *
 * The reference keeps categorical columns as dense int codes + decoder
 * dicts (`utils.py:53-82`, `core.py:64-65`) and decodes on demand
 * (`property_manager.py:179-256`). Here strings stay strings (Parquet
 * dictionary pages make that free); codes are produced only when an
 * algorithm wants dense ints, and are DETERMINISTIC — `dense_rank`
 * over sorted distinct values, not first-appearance order
 * (`utils.py:74-81`), which cannot be reproduced under distribution.
 */
object PropertyOps {

  /** C5: categorical -> dense int codes (0-based, sorted order).
    * Returns the code table (value, code) — broadcast-sized by
    * definition (one row per distinct category). */
  def categoricalCodes(df: DataFrame, prop: String): DataFrame =
    df.select(col(prop).as("value")).where(col("value").isNotNull).distinct()
      .withColumn("code", dense_rank().over(Window.orderBy(col("value"))) - 1)

  /** C5: attach `<prop>_code` via broadcast join against the code table. */
  def encodeCategorical(df: DataFrame, prop: String): DataFrame = {
    val codes = categoricalCodes(df, prop)
      .withColumnRenamed("value", prop).withColumnRenamed("code", s"${prop}_code")
    df.join(broadcast(codes), Seq(prop), "left")
  }

  /** C6: decode int codes back to strings with an "Unknown" default
    * (`property_manager.py:198,236`): broadcast join + coalesce. */
  def decode(df: DataFrame, codeCol: String, codes: DataFrame,
             outCol: String, defaultLabel: String = "Unknown"): DataFrame =
    df.join(broadcast(codes).withColumnRenamed("code", codeCol), Seq(codeCol), "left")
      .withColumn(outCol, coalesce(col("value"), lit(defaultLabel)))
      .drop("value")

  /** C7: node label "{layer}:{node_id}" (`property_manager.py:156-177`). */
  def nodeLabel: Column = concat_ws(":", col("layer"), col("nodeId"))

  def withNodeLabels(g: OnionGraph, prop: String = "label"): OnionGraph =
    g.copy(vertices = g.vertices.withColumn(prop, nodeLabel))

  /** C8: flatten arbitrarily nested label lists, dedup, join with ", "
    * (`visualisation.py:30-51`, `:54-85`) — pure higher-order
    * functions, no UDF. Input column must be array-typed. */
  def joinedLabels(nested: Column): Column =
    array_join(array_distinct(flatten(nested)), ", ")

  // ------------------------------------------------- point lookups (P1-P4)

  /** P1/P2: one property of one vertex. A full-table filter on `vid`
    * Catalyst-prunes to a single-column parquet scan; for chatty
    * interactive use, collect [[nodeMap]] once instead. */
  def getVertexProperty(g: OnionGraph, layer: String, nodeId: String,
                        prop: String): Option[Any] =
    g.vertices.filter(col("layer") === layer && col("nodeId") === nodeId)
      .select(prop).collect().headOption.map(_.get(0))

  /** Largest vertex count [[nodeMap]] will collect to the driver.
    * ~10M entries ≈ 1-2 GB of driver heap as a Scala Map — beyond
    * that the facade mirror is a driver bomb, not a convenience. */
  val NodeMapMaxVertices: Long = 10000000L

  /** The reference's cached `node_map` (`onionnet.py:181-198`):
    * (layer, nodeId) -> vid, collected to the driver for interactive
    * point lookups. Only sane when the vertex table is small or
    * pre-filtered; algorithms never use this. Guarded (r12 verdict
    * #4): refuses to collect past [[NodeMapMaxVertices]] — at 100 TB
    * the vertex table is billions of rows and this innocent-looking
    * facade property must fail fast with a pointer to the
    * distributed alternatives, not OOM the driver. */
  def nodeMap(g: OnionGraph,
              maxVertices: Long = NodeMapMaxVertices): Map[(String, String), Long] = {
    val n = g.vertices.count()
    require(n <= maxVertices,
      s"nodeMap would collect $n vertices to the driver (limit " +
        s"$maxVertices). Pre-filter the graph, or use " +
        "getVertexProperty / viewNodeProperties (distributed point " +
        "lookups) instead.")
    g.vertices.select("layer", "nodeId", "vid").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  /** P3: point-write of one vertex property, returning a NEW graph
    * (immutable analogue of `property_manager.py:75-100`; design delta
    * SURVEY §7.6). Creates the column if absent. */
  def setVertexProperty(g: OnionGraph, layer: String, nodeId: String,
                        prop: String, value: Column): OnionGraph = {
    val hit = col("layer") === layer && col("nodeId") === nodeId
    val updated =
      if (g.vertices.columns.contains(prop))
        g.vertices.withColumn(prop, when(hit, value).otherwise(col(prop)))
      else
        g.vertices.withColumn(prop, when(hit, value))
    g.copy(vertices = updated)
  }

  /** P4: all properties of one vertex as a single-row DataFrame. */
  def viewNodeProperties(g: OnionGraph, layer: String, nodeId: String): DataFrame =
    g.vertices.filter(col("layer") === layer && col("nodeId") === nodeId)
}
