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

  // Real xxhash64 collisions aren't practically constructible, so the
  // audit is pinned with hand-built (vid, layer, nodeId) rows.
  private def keyed(rs: (Long, String, String)*) =
    rs.toDF("vid", "layer", "nodeId")

  test("vidCollisions: benign re-append of an existing key is NOT a collision") {
    assert(OnionBuilder.vidCollisions(
      keyed((1L, "L1", "a"), (2L, "L1", "b")), keyed((1L, "L1", "a"))) == 0L)
  }

  test("vidCollisions catches two distinct batch keys on one vid") {
    assert(OnionBuilder.vidCollisions(
      keyed((1L, "L1", "a")), keyed((9L, "L1", "x"), (9L, "L1", "y"))) == 1L)
  }

  test("vidCollisions catches a batch key colliding with a DIFFERENT existing key") {
    // the merge's vid anti-join would silently drop this batch row as
    // "already present" — the audit must expose it
    assert(OnionBuilder.vidCollisions(
      keyed((1L, "L1", "a"), (2L, "L1", "b")), keyed((1L, "L1", "z"))) == 1L)
  }

  test("vidCollisions semi-join broadcasts the batch-vid probe side") {
    // LeftSemi can only broadcast the RIGHT (probe) side, so the
    // presence of a BroadcastHashJoin in the FINAL adaptive plan proves
    // the batch side was broadcast — the existing graph is never
    // shuffled for the audit. AQE decides at runtime; assert after
    // execution.
    val df = OnionBuilder.vidCollisionsDf(
      keyed((1L, "L1", "a"), (2L, "L1", "b")), keyed((1L, "L1", "a")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast semi-join in:\n$plan")
  }

  test("grow audit tolerates exact duplicate rows when dropDuplicates=false") {
    // duplicate ROWS of one key share a vid by construction; only
    // distinct keys sharing a vid are a collision (key-aware audit)
    val dup = Seq(("a", "L1", 1.0), ("a", "L1", 1.0)).toDF("node_id", "layer", "score")
    val g = OnionBuilder.grow(dup, edges.limit(0),
      GrowOptions(dropDuplicates = false, auditVidCollisions = true))
    assert(g.numVertices == 2)
  }
}
