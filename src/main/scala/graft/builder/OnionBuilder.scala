package graft.builder

import graft.model.OnionGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Ingest pipeline: node/edge DataFrames -> [[OnionGraph]].
 *
 * Re-expresses `builder.grow_onion` (`builder.py:37-110`) +
 * `add_vertices_from_dataframe` (`builder.py:112-176`) +
 * `add_edges_from_dataframe` (`builder.py:178-255`) as one declarative
 * Spark pipeline: validate -> coerce keys to string -> NA handling ->
 * dedup -> assign vid -> (edges) endpoint resolution with silent
 * dangling-edge drop.
 *
 * All steps are lazy DataFrame transforms: Catalyst fuses the filters,
 * pushes projections to the scan, and the only shuffles are the key
 * dedups and the two endpoint semi-joins.
 */
object OnionBuilder {

  /** Options mirroring `grow_onion`'s keyword surface (`builder.py:46-60`). */
  final case class GrowOptions(
      idCol: String = "node_id",
      layerCol: String = "layer",
      srcIdCol: String = "source_id",
      srcLayerCol: String = "source_layer",
      dstIdCol: String = "target_id",
      dstLayerCol: String = "target_layer",
      nodePropCols: Seq[String] = Nil,
      edgePropCols: Seq[String] = Nil,
      dropNa: Boolean = true,
      fillNaWith: String = "N/A",
      dropDuplicates: Boolean = true,
      auditVidCollisions: Boolean = false)

  /** Build the graph. Validation raises IllegalArgumentException on a
    * missing required column (reference raises ValueError,
    * `builder.py:85-92`). */
  def grow(nodes: DataFrame, edges: DataFrame,
           opts: GrowOptions = GrowOptions()): OnionGraph = {
    val o = opts
    requireCols(nodes, Seq(o.idCol, o.layerCol) ++ o.nodePropCols, "nodes")
    requireCols(edges,
      Seq(o.srcIdCol, o.srcLayerCol, o.dstIdCol, o.dstLayerCol) ++ o.edgePropCols,
      "edges")

    // ---- vertices: keys to string (builder.py:133-134), NA handling
    // (builder.py:136-139), dedup on (id, layer) (builder.py:94-97).
    var vs = nodes
      .withColumn("nodeId", col(o.idCol).cast("string"))
      .withColumn("layer", col(o.layerCol).cast("string"))
    vs = if (o.dropNa) vs.na.drop(Seq("nodeId", "layer"))
         else vs.na.fill(o.fillNaWith, Seq("nodeId", "layer"))
    if (o.dropDuplicates) vs = vs.dropDuplicates("layer", "nodeId")
    val vertices = vs
      .withColumn("vid", OnionGraph.vid(col("layer"), col("nodeId")))
      .select(Seq(col("vid"), col("layer"), col("nodeId"))
        ++ o.nodePropCols.map(col): _*)

    // ---- edges: same cleaning (builder.py:201-210), dedup on the key
    // 4-tuple (builder.py:94-97), then endpoint resolution with silent
    // dangling-edge drop (builder.py:219-224) = two LEFT SEMI joins.
    var es = edges
      .withColumn("srcId", col(o.srcIdCol).cast("string"))
      .withColumn("srcLayer", col(o.srcLayerCol).cast("string"))
      .withColumn("dstId", col(o.dstIdCol).cast("string"))
      .withColumn("dstLayer", col(o.dstLayerCol).cast("string"))
    val ekeys = Seq("srcId", "srcLayer", "dstId", "dstLayer")
    es = if (o.dropNa) es.na.drop(ekeys) else es.na.fill(o.fillNaWith, ekeys)
    if (o.dropDuplicates) es = es.dropDuplicates(ekeys)
    val resolved = es
      .withColumn("src", OnionGraph.vid(col("srcLayer"), col("srcId")))
      .withColumn("dst", OnionGraph.vid(col("dstLayer"), col("dstId")))
      .select(Seq("src", "dst", "srcLayer", "srcId", "dstLayer", "dstId")
        .map(col) ++ o.edgePropCols.map(col): _*)
    val vids = vertices.select("vid")
    val kept = resolved
      .join(vids.withColumnRenamed("vid", "src"), Seq("src"), "left_semi")
      .join(vids.withColumnRenamed("vid", "dst"), Seq("dst"), "left_semi")

    if (o.auditVidCollisions) {
      val collisions = vertices.groupBy("vid").count().filter(col("count") > 1).count()
      require(collisions == 0L, s"xxhash64 vid collision on $collisions keys")
    }
    OnionGraph(vertices, kept)
  }

  private def requireCols(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"$what DataFrame missing required columns: ${missing.mkString(", ")}")
  }
}
