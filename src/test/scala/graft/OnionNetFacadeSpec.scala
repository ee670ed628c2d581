package graft

import graft.algos.Traversals
import graft.views.Filters
import org.apache.spark.sql.functions._

/** The drop-in facade walks the reference's method surface
  * (`onionnet.py:15-208`): grow, search, views, point ops, export,
  * node-map memoization + invalidation. */
class OnionNetFacadeSpec extends SparkSuite {
  import spark.implicits._

  private def freshNet = {
    val net = new OnionNet(spark)
    val nodes = Seq(("a", "L1", 1.0), ("b", "L1", 2.0), ("c", "L2", 3.0))
      .toDF("node_id", "layer", "score")
    val edges = Seq(("a", "L1", "b", "L1"), ("b", "L1", "c", "L2"))
      .toDF("source_id", "source_layer", "target_id", "target_layer")
    net.growOnion(nodes, edges,
      graft.builder.OnionBuilder.GrowOptions(nodePropCols = Seq("score")))
    net
  }

  test("g before grow raises; after grow exposes the graph") {
    val net = new OnionNet(spark)
    intercept[IllegalArgumentException] { net.g }
    assert(freshNet.g.numVertices == 3)
  }

  test("search / viewLayers / components / filters / bipartite delegate") {
    val net = freshNet
    assert(net.search("L1", "a", 1).numVertices == 2)
    assert(net.viewLayers(Seq("L1")).numVertices == 2)
    intercept[IllegalArgumentException] { net.viewLayers(Seq("NOPE")) }
    // strong (reference default): the DAG has 3 singleton SCCs
    assert(net.viewComponents().count() == 3)
    assert(net.viewComponents(strong = false).count() == 1)
    assert(net.filterViewByProperty(
      Filters.VertexDim, "score", ">", 1.5).numVertices == 2)
    assert(net.composeFilters(Seq(col("score") > 0.5, col("layer") === "L1"))
      .numVertices == 2)
    assert(net.createBipartiteGv("L1", "L2").numEdges == 1)
  }

  test("node map memoizes and invalidates on growth and mutation") {
    val net = freshNet
    val m1 = net.nodeMap
    assert(m1.contains(("L1", "a")) && m1.size == 3)
    net.setVertexProperty("L1", "a", "score", lit(9.0))
    assert(net.getVertexProperty("L1", "a", "score").contains(9.0))
    val nodes2 = Seq(("x", "L9")).toDF("node_id", "layer")
    val edges2 = Seq.empty[(String, String, String, String)]
      .toDF("source_id", "source_layer", "target_id", "target_layer")
    // repeated growOnion APPENDS (builder.py:112-176), so the node map
    // is re-memoized over the MERGED graph
    net.growOnion(nodes2, edges2)
    assert(net.nodeMap.keySet ==
      Set(("L1", "a"), ("L1", "b"), ("L2", "c"), ("L9", "x")))
  }

  test("incremental growOnion appends: existing keys win, edges resolve merged") {
    val net = freshNet // a-b (L1), b-c (L1->L2), scores 1/2/3
    // second batch: duplicate b with a DIFFERENT score (must be
    // ignored — existing wins, builder.py:141-147), a new vertex d,
    // and edges c->d (new->new endpoint mix) + a->b (duplicate edge,
    // dropped by cross-batch dedup) + a->ghost (dangling, dropped)
    val nodes2 = Seq(("b", "L1", 99.0), ("d", "L2", 4.0))
      .toDF("node_id", "layer", "score")
    val edges2 = Seq(
      ("c", "L2", "d", "L2"), ("a", "L1", "b", "L1"),
      ("a", "L1", "ghost", "L7")
    ).toDF("source_id", "source_layer", "target_id", "target_layer")
    net.growOnion(nodes2, edges2,
      graft.builder.OnionBuilder.GrowOptions(nodePropCols = Seq("score")))
    val g = net.g
    assert(g.numVertices == 4)
    assert(g.numEdges == 3) // a-b, b-c, c-d
    assert(net.getVertexProperty("L1", "b", "score").contains(2.0),
      "existing vertex keeps its original property on key collision")
    assert(net.getVertexProperty("L2", "d", "score").contains(4.0))
    // the appended edge connects across batches
    assert(net.search("L2", "c", 1).numVertices == 2)
  }

  test("two-call grow equals one-call grow (vertices and edges)") {
    val allNodes = Seq(("a", "L1", 1.0), ("b", "L1", 2.0), ("c", "L2", 3.0),
      ("d", "L2", 4.0)).toDF("node_id", "layer", "score")
    val allEdges = Seq(("a", "L1", "b", "L1"), ("b", "L1", "c", "L2"),
      ("c", "L2", "d", "L2")).toDF(
      "source_id", "source_layer", "target_id", "target_layer")
    val opts = graft.builder.OnionBuilder.GrowOptions(
      nodePropCols = Seq("score"))
    val oneCall = new OnionNet(spark)
    oneCall.growOnion(allNodes, allEdges, opts)
    val twoCall = new OnionNet(spark)
    twoCall.growOnion(allNodes.where(col("layer") === "L1"),
      allEdges.where(col("source_layer") === "L1"
        && col("target_layer") === "L1"), opts)
    twoCall.growOnion(allNodes.where(col("layer") === "L2"),
      allEdges.where(col("target_layer") === "L2"), opts)
    assert(rows(twoCall.g.vertices) === rows(oneCall.g.vertices))
    assert(rows(twoCall.g.edges) === rows(oneCall.g.edges))
  }

  test("append after setVertexProperty keeps the mutation") {
    val net = freshNet
    net.setVertexProperty("L1", "a", "score", lit(9.0))
    val nodes2 = Seq(("x", "L9", 0.0)).toDF("node_id", "layer", "score")
    val edges2 = Seq.empty[(String, String, String, String)]
      .toDF("source_id", "source_layer", "target_id", "target_layer")
    net.growOnion(nodes2, edges2,
      graft.builder.OnionBuilder.GrowOptions(nodePropCols = Seq("score")))
    assert(net.getVertexProperty("L1", "a", "score").contains(9.0),
      "a property set before an append must survive the merge")
  }

  test("encoding-tuple lookup inverts the name-tuple map") {
    val net = freshNet
    val vid = net.getVertexByNameTuple("L1", "a").get
    assert(net.getVertexByEncodingTuple(vid).contains(("L1", "a")))
    assert(net.getVertexByEncodingTuple(-1L).isEmpty)
  }

  test("directed=false symmetrizes: search reaches upstream too") {
    val net = new OnionNet(spark, directed = false)
    val nodes = Seq(("a", "L1"), ("b", "L1"), ("c", "L2"))
      .toDF("node_id", "layer")
    val edges = Seq(("a", "L1", "b", "L1"), ("b", "L1", "c", "L2"))
      .toDF("source_id", "source_layer", "target_id", "target_layer")
    net.growOnion(nodes, edges)
    // downstream search from the SINK reaches everything on the
    // symmetrized graph; on the directed graph it would reach only c
    assert(net.search("L2", "c", 2).numVertices == 3)
    assert(net.g.numEdges == 4)
  }

  test("point views and export") {
    val net = freshNet
    net.createNodeLabelProperty()
    assert(net.viewNodeProperties("L1", "a").count() == 1)
    assert(net.viewNodePropertiesByNames("L1", "a", Seq("score"))
      .columns.toSeq == Seq("layer", "nodeId", "score"))
    assert(net.exportInfo("v").count() == 3)
    assert(net.exportInfo("e").count() == 2)
    assert(net.getVertexByNameTuple("L2", "c").isDefined)
  }

  test("beyond-reference analytics ride the same facade") {
    val net = freshNet // path a -> b -> c
    // centrality on the undirected projection: b is the middle
    val cent = net.centrality(maxDepth = 3)
      .select("node", "n_reached").as[(String, Long)].collect().toMap
    assert(cent === Map("L1|a" -> 2L, "L1|b" -> 2L, "L2|c" -> 2L))
    val bc = net.betweenness(maxDepth = 3)
      .select("node", "bc_q").as[(String, Long)].collect().toMap
    assert(bc === Map("L1|b" -> 1000000L))
    // the scale-path twins agree with the exact forms when the sketch
    // has room (k > n) and the pivots cover every node
    val sk = net.centralitySketched(maxDepth = 3)
      .select("node", "n_reached_est").as[(String, Long)].collect().toMap
    assert(sk === cent)
    val bs = net.betweennessSampled(maxDepth = 3, numPivots = 10)
      .select("node", "bc_q").as[(String, Long)].collect().toMap
    assert(bs === bc)
    // force layout: one coordinate pair per vertex, inside the box
    val fl = net.forceLayout(iters = 2)
      .as[(String, Long, Long)].collect()
    assert(fl.map(_._1).toSet === Set("L1|a", "L1|b", "L2|c"))
    assert(fl.forall(p => p._2 >= 0 && p._2 <= 1000000L
      && p._3 >= 0 && p._3 <= 1000000L))
    // personalized pagerank, hand-computed on the a -> b -> c path:
    //   r1 = (0.15e9, 0.85e9, 0); r2 = (0.15e9, 0.85*0.15e9, 0.85*0.85e9)
    val seeds = net.g.vertices.where(col("nodeId") === "a").select("vid")
    val pr = net.pageRank(iters = 2, seeds = Some(seeds))
      .join(net.g.vertices, Seq("vid"))
      .select(col("nodeId"), col("rank_fp")).as[(String, Long)]
      .collect().toMap
    assert(pr === Map("a" -> 150000000L, "b" -> 127500000L,
      "c" -> 722500000L))
    // weighted distances fall back to unit qty (grow default)
    val d = net.shortestDistances("L1", "a")
      .join(net.g.vertices, Seq("vid"))
      .select(col("nodeId"), col("dist")).as[(String, Double)]
      .collect().toMap
    assert(d === Map("a" -> 0.0, "b" -> 1.0, "c" -> 2.0))
  }
}
