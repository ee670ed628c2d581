package graft

import graft.builder.OnionBuilder
import graft.builder.OnionBuilder.GrowOptions
import org.apache.spark.sql.functions._

/** S1-S3 + C1-C3: ingest semantics from builder.py (see SURVEY §2.1/2.2). */
class BuilderSpec extends SparkSuite {
  import spark.implicits._

  private def nodes = Seq(
    ("a", "L1", 1.0), ("b", "L1", 2.0), ("b", "L1", 2.5), // dup key
    ("a", "L2", 3.0), (null, "L1", 4.0)                   // null key
  ).toDF("node_id", "layer", "score")

  private def edges = Seq(
    ("a", "L1", "b", "L1", 0.5),
    ("a", "L1", "b", "L1", 0.7),   // dup edge key
    ("a", "L1", "zz", "L9", 0.9),  // dangling target
    ("a", "L2", "a", "L1", 0.1)
  ).toDF("source_id", "source_layer", "target_id", "target_layer", "w")

  test("grow dedups nodes on (layer,id) and drops null keys") {
    val g = OnionBuilder.grow(nodes, edges,
      GrowOptions(nodePropCols = Seq("score"), edgePropCols = Seq("w")))
    // a/L1, b/L1 (dedup), a/L2; null-key row dropped (builder.py:136-139)
    assert(g.numVertices == 3)
  }

  test("grow silently drops dangling edges (builder.py:219-224)") {
    val g = OnionBuilder.grow(nodes, edges,
      GrowOptions(nodePropCols = Seq("score"), edgePropCols = Seq("w")))
    // a→b (deduped) and a(L2)→a(L1); dangling zz/L9 dropped
    assert(g.numEdges == 2)
    assert(g.edges.filter(col("dstId") === "zz").count() == 0)
  }

  test("same (layer,nodeId) in different layers are distinct vertices") {
    val g = OnionBuilder.grow(nodes, edges, GrowOptions())
    val vids = g.vertices.select("vid").as[Long].collect()
    assert(vids.distinct.length == 3)
    assert(g.vertices.filter(col("nodeId") === "a").count() == 2)
  }

  test("vid is deterministic across builds") {
    val g1 = OnionBuilder.grow(nodes, edges, GrowOptions())
    val g2 = OnionBuilder.grow(nodes.orderBy(rand(7)), edges, GrowOptions())
    assert(rows(g1.vertices.select("vid", "layer", "nodeId")) ==
      rows(g2.vertices.select("vid", "layer", "nodeId")))
  }

  test("fillNa keeps rows when dropNa=false (builder.py:136-139)") {
    val g = OnionBuilder.grow(nodes, edges,
      GrowOptions(dropNa = false, fillNaWith = "N/A"))
    assert(g.numVertices == 4)
    assert(g.vertices.filter(col("nodeId") === "N/A").count() == 1)
  }

  test("missing required column raises (builder.py:85-92)") {
    intercept[IllegalArgumentException] {
      OnionBuilder.grow(nodes.drop("layer"), edges, GrowOptions())
    }
  }
}
