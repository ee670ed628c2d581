package graft

import graft.algos.Traversals
import graft.builder.OnionBuilder
import graft.builder.OnionBuilder.GrowOptions
import graft.model.OnionGraph
import graft.props.PropertyOps
import graft.views.{Exporter, Filters}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Drop-in facade mirroring the reference's `OnionNet` class
 * (`onionnet.py:15-208`): one mutable current graph, delegating
 * methods, and a memoized node map invalidated on growth
 * (`onionnet.py:41,55,192-198`). A user of the reference's API walks
 * method-for-method onto this class; everything underneath is the
 * immutable compositional library (each mutation swaps `current`).
 *
 * `directed = false` mirrors the reference constructor flag
 * (`onionnet.py:30-37`, `core.py:41,51`): the grown edge set is
 * symmetrized, so every traversal/degree/component behaves
 * undirected.
 */
final class OnionNet(val spark: SparkSession, val directed: Boolean = true) {

  private var current: OnionGraph =
    OnionGraph(
      spark.emptyDataFrame
        .select(), // replaced on first growOnion
      spark.emptyDataFrame.select())
  // the directed graph as grown (pre-symmetrize): repeated growOnion
  // calls merge into THIS, so the undirected facade never symmetrizes
  // twice
  private var base: OnionGraph = current
  private var grown = false
  private var nodeMapCache: Option[Map[(String, String), Long]] = None
  private var inverseNodeMapCache: Option[Map[Long, (String, String)]] = None
  private var layerSetCache: Option[Set[String]] = None

  /** The underlying graph (reference's `.g` property, `onionnet.py:201`). */
  def g: OnionGraph = {
    require(grown, "graph not grown yet — call growOnion first")
    current
  }

  /** S1 `grow_onion` — also invalidates the node-map cache
    * (`onionnet.py:44-55`). Repeated calls APPEND to the live graph
    * like the reference (`builder.py:112-176` adds vertices into the
    * existing structure, `builder.py:251-255` appends edges): existing
    * (layer, nodeId) keys win, new edges resolve against the merged
    * vertex set — see [[OnionBuilder.merge]]. */
  def growOnion(nodes: DataFrame, edges: DataFrame,
                opts: GrowOptions = GrowOptions()): Unit = {
    base = if (!grown) OnionBuilder.grow(nodes, edges, opts)
           else OnionBuilder.merge(base, nodes, edges, opts)
    current = if (directed) base else base.symmetrize
    grown = true
    nodeMapCache = None
    inverseNodeMapCache = None
    layerSetCache = None
  }

  /** Retirement twin of [[growOnion]] (r13 verdict #5): remove the
    * given (layer, nodeId) keys with induced-subgraph semantics —
    * see [[OnionBuilder.removeVertices]]. Mutates the pre-symmetrize
    * base (like setVertexProperty), so a later growOnion append
    * merges into the shrunk graph, and invalidates the same caches
    * growOnion does. grow ∘ shrink ∘ grow == direct build
    * (InvariantProps pins the round-trip). */
  def shrinkOnion(keys: org.apache.spark.sql.DataFrame,
                  opts: OnionBuilder.GrowOptions =
                    OnionBuilder.GrowOptions()): Unit = {
    require(grown, "graph not grown yet — call growOnion first")
    base = OnionBuilder.removeVertices(base, keys, opts)
    current = if (directed) base else base.symmetrize
    nodeMapCache = None
    inverseNodeMapCache = None
    layerSetCache = None
  }

  /** Materialize the current graph and truncate its lineage
    * (eager `localCheckpoint`). Call between appends: without it, every
    * [[growOnion]] merge EMBEDS the full prior build plan into the new
    * one (the anti-join probe, the vertex union, and both edge
    * endpoint resolutions each re-derive the base from source), so a
    * k-call incremental build re-executes build 1 O(k²) times. After a
    * checkpoint the base is a scanned block, not a plan. The blocks are
    * session-tracked RDDs — callers running many graphs release them
    * via `spark.sparkContext.getPersistentRDDs` (as Bench does). */
  def checkpoint(): Unit = {
    require(grown, "graph not grown yet — call growOnion first")
    // Two independent materialization jobs — submit them CONCURRENTLY
    // so the wall cost is max(vertices, edges) instead of the sum.
    // Driver/job-launch latency, not data volume, binds small
    // materializations; Spark job submission is thread-safe and the
    // facade flips no session confs here.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val vF = Future(base.vertices.localCheckpoint())
    val eF = Future(base.edges.localCheckpoint())
    base = OnionGraph(Await.result(vF, Duration.Inf),
      Await.result(eF, Duration.Inf))
    current = if (directed) base else base.symmetrize
  }

  /** Memoized `node_map` (`onionnet.py:181-198`). */
  def nodeMap: Map[(String, String), Long] = {
    if (nodeMapCache.isEmpty) nodeMapCache = Some(PropertyOps.nodeMap(g))
    nodeMapCache.get
  }

  // ------------------------------------------------------------- queries
  def search(layer: String, nodeId: String, maxDist: Int,
             direction: Traversals.Direction = Traversals.Downstream,
             includeUpstreamChildren: Boolean = false): OnionGraph = {
    val reached = Traversals.search(g, layer, nodeId, maxDist, direction,
      includeUpstreamChildren)
    val vs = g.vertices.join(reached, Seq("vid"))
    OnionGraph(vs, OnionGraph.inducedEdges(vs, g.edges))
  }

  /** F3 — validates layer names like the reference
    * (`searcher.py:266-268` raises on an unknown layer). The layer
    * set is memoized like `node_map`, invalidated on growth. */
  def viewLayers(names: Seq[String]): OnionGraph = {
    if (layerSetCache.isEmpty) layerSetCache = Some(
      g.vertices.select("layer").distinct().collect().map(_.getString(0)).toSet)
    val unknown = names.filterNot(layerSetCache.get)
    require(unknown.isEmpty, s"unknown layers: ${unknown.mkString(", ")}")
    g.viewLayers(names)
  }

  /** T4 — `connectivity="strong"` is the reference DEFAULT
    * (`searcher.py:284-295`); components relabeled to the
    * lexicographic-min member name for determinism. The strong path is
    * the DataFrame-native FW-BW coloring kernel
    * ([[Traversals.strongComponents]]) — O(V) label state per round,
    * no GraphX SCC iteration blowup at scale (TraversalsSpec pins
    * partition equality against the GraphX kernel). */
  def viewComponents(minSize: Long = 1, strong: Boolean = true): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    if (!strong) Traversals.componentSizes(g, minSize)
    else Traversals.strongComponents(g)
      .groupBy("comp")
      .agg(count(lit(1)).as("size"))
      .filter(col("size") >= minSize)
      .select("comp", "size")
  }

  def filterViewByProperty(dim: Filters.Dim, prop: String, op: String,
                           value: Any, pruneIsolated: Boolean = false): OnionGraph =
    Filters.filterViewByProperty(g, dim, prop, op, value, pruneIsolated)

  def composeFilters(preds: Seq[Column], and: Boolean = true): OnionGraph =
    g.filterVertices(
      if (and) Filters.composeAnd(preds) else Filters.composeOr(preds))

  def createBipartiteGv(a: String, b: String): OnionGraph = g.bipartite(a, b)

  // ---------------------------------------------------------- point ops
  def getVertexByNameTuple(layer: String, nodeId: String): Option[Long] =
    nodeMap.get((layer, nodeId))

  /** P1's encoded-tuple variant (`property_manager.py:24-43`): the
    * reference keys `custom_id_to_vertex_index` by encoded
    * (layer_hash, node_id_hash) and keeps the inverse dict beside it
    * (`core.py:54-55`); here the 64-bit `vid` IS the encoding, and the
    * memoized inverse map decodes it back to the (layer, nodeId) name
    * tuple. */
  def getVertexByEncodingTuple(vid: Long): Option[(String, String)] = {
    if (inverseNodeMapCache.isEmpty)
      inverseNodeMapCache = Some(nodeMap.map(_.swap))
    inverseNodeMapCache.get.get(vid)
  }

  def getVertexProperty(layer: String, nodeId: String, prop: String): Option[Any] =
    PropertyOps.getVertexProperty(g, layer, nodeId, prop)

  /** P3 — swaps in the updated graph (the reference mutates in place;
    * here the facade IS the mutable cell, SURVEY §7.4). */
  def setVertexProperty(layer: String, nodeId: String, prop: String,
                        value: Column): Unit = {
    require(grown, "graph not grown yet — call growOnion first")
    // mutate the pre-symmetrize base too, or a later growOnion append
    // (which merges into base) would silently drop the property
    base = PropertyOps.setVertexProperty(base, layer, nodeId, prop, value)
    current = if (directed) base else base.symmetrize
    nodeMapCache = None
  }

  def viewNodeProperties(layer: String, nodeId: String): DataFrame =
    PropertyOps.viewNodeProperties(g, layer, nodeId)

  def viewNodePropertiesByNames(layer: String, nodeId: String,
                                props: Seq[String]): DataFrame =
    PropertyOps.viewNodeProperties(g, layer, nodeId)
      .select(("layer" +: "nodeId" +: props)
        .map(org.apache.spark.sql.functions.col): _*)

  def createNodeLabelProperty(prop: String = "label"): Unit = {
    require(grown, "graph not grown yet — call growOnion first")
    base = PropertyOps.withNodeLabels(base, prop)
    current = if (directed) base else base.symmetrize
  }

  /** Reference parity for `set_node_sizes_and_text_by_depth`
    * (`visualisation.py:273-308`): per-vertex (dist, size, text_size)
    * from an undirected BFS at `(layer, nodeId)`, sizes linearly
    * rescaled between the min/max bounds. */
  def setNodeSizesAndTextByDepth(layer: String, nodeId: String,
                                 maxSize: Double = 20, minSize: Double = 5,
                                 maxTextSize: Double = 15,
                                 minTextSize: Double = 8): DataFrame =
    graft.algos.Traversals.depthScaledSizesAndText(
      g, layer, nodeId, minSize, maxSize, minTextSize, maxTextSize)

  // ------------------------------------------------------------- export
  def exportInfo(mode: String = "v", props: Seq[String] = Nil): DataFrame =
    if (mode == "v") Exporter.vertexInfo(g, props) else Exporter.edgeInfo(g, props)

  // ------------------------------------- beyond-reference analytics (§2.9)
  // The graph-tool algorithm suite the reference's README motivates but
  // never wraps — exposed on the same stateful facade so a reference
  // user grows into them without leaving the API.

  /** PageRank over the current graph (exact fixed-point micro-units;
    * pass `seeds` for the personalized variant). */
  def pageRank(iters: Int = 5,
               seeds: Option[DataFrame] = None): DataFrame =
    graft.algos.GraphOps.pageRankFixedPoint(g, iters, seeds)

  /** Weighted shortest-path distances from `(layer, nodeId)` along a
    * numeric edge property. */
  def shortestDistances(layer: String, nodeId: String,
                        weightProp: String = "qty",
                        maxIter: Int = 20): DataFrame = {
    import org.apache.spark.sql.functions._
    val seeds = g.vertices.where(
      col("layer") === layer && col("nodeId") === nodeId)
    // graphs grown without an edge-weight property get unit weights
    // (hop distances) rather than an analysis exception
    val gg = if (g.edges.columns.contains(weightProp)) g
      else OnionGraph(g.vertices, g.edges.withColumn(weightProp, lit(1.0)))
    graft.algos.GraphOps.weightedSssp(gg, seeds, maxIter, weightProp)
  }

  /** Closeness + harmonic centrality of the current graph's undirected
    * projection (node key = "layer|nodeId"). */
  def centrality(maxDepth: Int): DataFrame =
    graft.algos.LinkAnalysis.harmonicCentrality(labeledEdges, maxDepth)

  /** Exact betweenness centrality of the undirected projection. */
  def betweenness(maxDepth: Int): DataFrame =
    graft.algos.LinkAnalysis.betweenness(labeledEdges, maxDepth)

  /** Sketched closeness/harmonic centrality — the full-graph scale
    * path (O(V·k) state vs [[centrality]]'s O(V²) pairs). */
  def centralitySketched(maxDepth: Int, k: Int = 64): DataFrame =
    graft.algos.LinkAnalysis.kmvCentrality(labeledEdges, maxDepth, k)

  /** Pivot-sampled betweenness — the full-graph scale path (O(m·V)
    * state vs [[betweenness]]'s O(V²)). */
  def betweennessSampled(maxDepth: Int, numPivots: Int): DataFrame =
    graft.algos.LinkAnalysis.betweennessPivots(labeledEdges, maxDepth, numPivots)

  /** Seeded force-directed layout of the current graph (the
    * `sfdp_layout` default at `visualisation.py:711`); node key =
    * "layer|nodeId". */
  def forceLayout(iters: Int = 3): DataFrame =
    graft.viz.VizData.forceLayout(labeledEdges, iters)

  /** Grid-binned force layout — the full-corpus scale path (exact
    * near-cell pairs + centroid far cells, O(n·cells) per iteration). */
  def forceLayoutBinned(iters: Int = 3, cell: Long = 125000L): DataFrame =
    graft.viz.VizData.forceLayoutBinned(labeledEdges, iters, cell = cell)

  private def labeledEdges: DataFrame = {
    import org.apache.spark.sql.functions._
    val v = g.vertices.select(col("vid"),
      concat_ws("|", col("layer"), col("nodeId")).as("name"))
    val j = g.edges.select("src", "dst")
      .join(v.select(col("vid").as("src"), col("name").as("a")), "src")
      .join(v.select(col("vid").as("dst"), col("name").as("b")), "dst")
      .select("a", "b")
    // hard lineage cut (RDD round-trip): Dataset.checkpoint's
    // attribute remapping trips over deduplicated self-join plans on
    // Spark 4.1 (see SparkEntry g37), and the BFS loops downstream
    // checkpoint every round — hand them clean attributes
    spark.createDataFrame(j.rdd, j.schema)
  }
}
