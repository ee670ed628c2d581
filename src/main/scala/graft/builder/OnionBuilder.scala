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

  /** Vertex cleaning stage: keys to string (builder.py:133-134), NA
    * handling (builder.py:136-139), dedup on (id, layer)
    * (builder.py:94-97), vid assignment. */
  private def cleanVertices(nodes: DataFrame, o: GrowOptions): DataFrame = {
    var vs = nodes
      .withColumn("nodeId", col(o.idCol).cast("string"))
      .withColumn("layer", col(o.layerCol).cast("string"))
    vs = if (o.dropNa) vs.na.drop(Seq("nodeId", "layer"))
         else vs.na.fill(o.fillNaWith, Seq("nodeId", "layer"))
    if (o.dropDuplicates) vs = vs.dropDuplicates("layer", "nodeId")
    vs.withColumn("vid", OnionGraph.vid(col("layer"), col("nodeId")))
      .select(Seq(col("vid"), col("layer"), col("nodeId"))
        ++ o.nodePropCols.map(col): _*)
  }

  /** Edge cleaning stage: same cleaning (builder.py:201-210), dedup on
    * the key 4-tuple (builder.py:94-97), endpoint vids assigned —
    * BEFORE dangling-edge resolution (the caller supplies the vertex
    * set to resolve against). */
  private def cleanEdges(edges: DataFrame, o: GrowOptions): DataFrame = {
    var es = edges
      .withColumn("srcId", col(o.srcIdCol).cast("string"))
      .withColumn("srcLayer", col(o.srcLayerCol).cast("string"))
      .withColumn("dstId", col(o.dstIdCol).cast("string"))
      .withColumn("dstLayer", col(o.dstLayerCol).cast("string"))
    val ekeys = Seq("srcId", "srcLayer", "dstId", "dstLayer")
    es = if (o.dropNa) es.na.drop(ekeys) else es.na.fill(o.fillNaWith, ekeys)
    if (o.dropDuplicates) es = es.dropDuplicates(ekeys)
    es.withColumn("src", OnionGraph.vid(col("srcLayer"), col("srcId")))
      .withColumn("dst", OnionGraph.vid(col("dstLayer"), col("dstId")))
      .select(Seq("src", "dst", "srcLayer", "srcId", "dstLayer", "dstId")
        .map(col) ++ o.edgePropCols.map(col): _*)
  }

  /** Endpoint resolution with silent dangling-edge drop
    * (builder.py:219-224) = two LEFT SEMI joins. */
  private def resolveEdges(resolved: DataFrame, vids: DataFrame): DataFrame =
    resolved
      .join(vids.withColumnRenamed("vid", "src"), Seq("src"), "left_semi")
      .join(vids.withColumnRenamed("vid", "dst"), Seq("dst"), "left_semi")

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
    val vertices = cleanVertices(nodes, o)
    val kept = resolveEdges(cleanEdges(edges, o), vertices.select("vid"))
    if (o.auditVidCollisions) {
      // Key-aware form (same as merge's vidCollisions): counting ROWS
      // per vid false-positives on exact duplicate (layer, nodeId) rows
      // when dropDuplicates=false — only DISTINCT keys sharing a vid
      // are a collision.
      val collisions = vertices.groupBy("vid")
        .agg(countDistinct(struct(col("layer"), col("nodeId"))).as("nkeys"))
        .filter(col("nkeys") > 1).count()
      require(collisions == 0L, s"xxhash64 vid collision on $collisions keys")
    }
    OnionGraph(vertices, kept)
  }

  /** APPEND a batch into an existing graph — the reference's repeated
    * `grow_onion` semantics (`builder.py:112-176` adds vertices into
    * the live structure via `graph.add_vertex`, skipping keys already
    * present; `builder.py:251-255` appends edges), so a user can build
    * a graph layer-by-layer across calls.
    *
    *  - EXISTING vertices win on a (layer, nodeId) collision: the new
    *    row is dropped wholesale, properties untouched (the reference's
    *    add_vertex consults `custom_id_to_vertex_index` and skips,
    *    `builder.py:141-147`).
    *  - New edges resolve their endpoints against the MERGED vertex
    *    set, so a batch may connect new vertices to pre-existing ones.
    *  - Edges dropped as dangling by an EARLIER call stay dropped even
    *    if this batch adds the missing endpoint — the reference drops
    *    at append time too (`builder.py:219-224`).
    *  - With `dropDuplicates` on, new edges duplicating an existing
    *    (src, dst) pair are dropped (cross-batch dedup on the 8-byte
    *    vid pair — equivalent to the key 4-tuple and shuffle-cheaper).
    *  - Property columns may differ per batch: the union aligns by
    *    name and null-fills, like pandas concat in the reference.
    *
    * Scale: two anti/semi-join exchanges on 8-byte keys per appended
    * batch, each sized by the BATCH (plus one probe of the existing
    * keys); the existing graph is never re-shuffled. */
  def merge(g: OnionGraph, nodes: DataFrame, edges: DataFrame,
            opts: GrowOptions = GrowOptions()): OnionGraph = {
    val o = opts
    requireCols(nodes, Seq(o.idCol, o.layerCol) ++ o.nodePropCols, "nodes")
    requireCols(edges,
      Seq(o.srcIdCol, o.srcLayerCol, o.dstIdCol, o.dstLayerCol) ++ o.edgePropCols,
      "edges")
    val cleaned = cleanVertices(nodes, o)
    val fresh = cleaned
      .join(g.vertices.select("vid"), Seq("vid"), "left_anti")
    val mergedVs = g.vertices.unionByName(fresh, allowMissingColumns = true)
    val resolved = resolveEdges(cleanEdges(edges, o), mergedVs.select("vid"))
    val freshEs =
      if (o.dropDuplicates)
        resolved.join(g.edges.select("src", "dst"), Seq("src", "dst"), "left_anti")
      else resolved
    if (o.auditVidCollisions) {
      val collisions = vidCollisions(g.vertices, cleaned)
      require(collisions == 0L, s"xxhash64 vid collision on $collisions keys")
    }
    OnionGraph(mergedVs, g.edges.unionByName(freshEs, allowMissingColumns = true))
  }

  /** REMOVE vertices by (layer, nodeId) key — the delete leg of the
    * core graph lifecycle (r13 verdict #5), closing the same build →
    * append → retire cycle the persisted index families close. The
    * retirement twin of [[merge]], with INDUCED-SUBGRAPH semantics:
    * every edge touching a removed vertex drops — the dangling-drop
    * contract (`builder.py:219-224`, an edge never outlives an
    * endpoint) applied in reverse, i.e. the F6 induced-subgraph rule
    * (`searcher.py:339`) with the predicate "not in the delete set".
    * Keys absent from the graph are ignored, so a replayed batch is a
    * no-op and remove-then-query equals a fresh build on the
    * remaining rows (rebuild-on-remaining, the x156–x164 rule applied
    * to the core model). Survivor rows keep their columns untouched.
    *
    * Scale shape: the delete set is batch-sized and BROADCASTS into
    * three anti-joins (vertices once, edges on each endpoint); the
    * graph itself never re-shuffles — same economics as merge's
    * append probes. */
  def removeVertices(g: OnionGraph, keys: DataFrame,
                     opts: GrowOptions = GrowOptions()): OnionGraph = {
    val o = opts
    requireCols(keys, Seq(o.idCol, o.layerCol), "keys")
    val dels = keys.select(OnionGraph.vid(
        col(o.layerCol).cast("string"), col(o.idCol).cast("string"))
      .as("vid")).distinct()
    OnionGraph(
      g.vertices.join(broadcast(dels), Seq("vid"), "left_anti"),
      g.edges
        .join(broadcast(dels.withColumnRenamed("vid", "src")),
          Seq("src"), "left_anti")
        .join(broadcast(dels.withColumnRenamed("vid", "dst")),
          Seq("dst"), "left_anti"))
  }

  /** Append-time vid collision count — BATCH-sized, not merged-set-
    * sized (the existing graph was audited when built, so N appends
    * must not cost N full-graph aggregations). Two checks in one pass:
    *  (a) two distinct batch keys hashing to one vid;
    *  (b) a batch key colliding with a DIFFERENT existing key — the
    *      merge's vid anti-join would silently drop it as "already
    *      present", so it must be caught here, not masked.
    * The existing side is semi-probed on the batch's vids only (AQE
    * broadcasts the small batch side — no full-graph shuffle); the
    * aggregation state is batch-sized. Package-private so the spec can
    * pin detection with constructed collisions (real xxhash64 collision
    * pairs are not practically constructible in a test). */
  private[graft] def vidCollisions(existing: DataFrame,
                                   batch: DataFrame): Long =
    vidCollisionsDf(existing, batch).count()

  /** The audit plan behind [[vidCollisions]], exposed so the spec can
    * pin both the result AND the physical shape (the semi-join must
    * broadcast the batch-vid probe side for a small batch — AQE decides
    * at runtime, so only an executed-plan assertion proves it). */
  private[graft] def vidCollisionsDf(existing: DataFrame,
                                     batch: DataFrame): DataFrame = {
    val batchKeys = batch.select("vid", "layer", "nodeId")
    val existingHits = existing.select("vid", "layer", "nodeId")
      .join(batchKeys.select("vid").distinct(), Seq("vid"), "left_semi")
    batchKeys.unionAll(existingHits)
      .groupBy("vid")
      .agg(countDistinct(struct(col("layer"), col("nodeId"))).as("nkeys"))
      .filter(col("nkeys") > 1)
  }

  private def requireCols(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"$what DataFrame missing required columns: ${missing.mkString(", ")}")
  }
}
