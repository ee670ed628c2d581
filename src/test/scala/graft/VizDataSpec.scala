package graft

import graft.builder.OnionBuilder
import graft.builder.OnionBuilder.GrowOptions
import graft.viz.VizData
import org.apache.spark.sql.functions._

/** V1-V7 visual-analytics data computations (visualisation.py). */
class VizDataSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", "L1", -10.0, "red"), ("b", "L1", 0.0, "blue"),
    ("c", "L2", 30.0, "red"), ("d", "L2", 10.0, "green"))
    .toDF("nodeId", "layer", "score", "color")

  test("colorContinuous normalizes min/max to [0,1]") {
    val out = VizData.colorContinuous(df, "score")
      .select("nodeId", "score_color_val").as[(String, Double)].collect().toMap
    assert(out("a") == 0.0 && out("c") == 1.0 && out("b") == 0.25)
  }

  test("zero-centred normalization is symmetric (visualisation.py:150-153)") {
    val out = VizData.colorContinuous(df, "score", zeroCentred = true)
      .select("nodeId", "score_color_val").as[(String, Double)].collect().toMap
    assert(out("b") == 0.5)                      // 0 maps to centre
    assert(out("c") == 1.0)                      // +max edge
    assert(out("a") == (-10.0 + 30.0) / 60.0)
  }

  test("constant column colors to 0.5, sizes to mi (visualisation.py:776-777)") {
    val const = Seq(("a", 5.0), ("b", 5.0)).toDF("nodeId", "v")
    assert(VizData.colorContinuous(const, "v")
      .select("v_color_val").as[Double].collect().toSet == Set(0.5))
    assert(VizData.propToSize(const, "v", 2.0, 9.0)
      .select("v_size").as[Double].collect().toSet == Set(2.0))
  }

  test("propToSize scales into [mi,ma] with power transform (V7)") {
    val out = VizData.propToSize(
        Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("nodeId", "v"),
        "v", 0.0, 1.0, power = 2.0)
      .select("nodeId", "v_size").as[(String, Double)].collect().toMap
    assert(out("a") == 0.0 && out("c") == 1.0)
    assert(math.abs(out("b") - (4.0 - 1.0) / 8.0) < 1e-12)
  }

  test("categorical colors cycle a palette deterministically (V1)") {
    val out = VizData.colorCategorical(df, "color", paletteSize = 2)
      .select("color", "color_color_idx").distinct()
      .as[(String, Int)].collect().toMap
    assert(out == Map("blue" -> 0, "green" -> 1, "red" -> 0)) // codes 0,1,2 mod 2
  }

  test("custom color map is strict on missing keys (visualisation.py:128-130)") {
    val full = VizData.colorByMap(df, "color",
      Map("red" -> "#f00", "blue" -> "#00f", "green" -> "#0f0"))
    assert(full.select("color_color").as[String].collect().toSet ==
      Set("#f00", "#00f", "#0f0"))
    val partial = VizData.colorByMap(df, "color", Map("red" -> "#f00"))
    intercept[Exception] { partial.collect() }
  }

  test("boolean coloring / halo flags (V1 bool, V3)") {
    val flags = df.withColumn("hot", col("score") > 5)
    val out = VizData.colorBoolean(flags, "hot")
      .select("nodeId", "hot_color_idx").as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 1, "b" -> 1, "c" -> 0, "d" -> 0))
  }

  test("layoutByLayer: x by layer rank, y dense within layer (V5)") {
    val out = VizData.layoutByLayer(df, xSpacing = 2.0, ySpacing = 1.0)
      .select("nodeId", "x", "y").as[(String, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out("a") == (0.0, 0.0) && out("b") == (0.0, 1.0))
    assert(out("c") == (2.0, 0.0) && out("d") == (2.0, 1.0))
  }

  test("bipartiteOrderedLayout orders right by barycenter (V6)") {
    val nodes = Seq(("l1", "A"), ("l2", "A"), ("l3", "A"),
      ("r1", "B"), ("r2", "B")).toDF("node_id", "layer")
    // r2 touches l1 (bary 0); r1 touches l3 (bary 2) -> r2 above r1
    val edges = Seq(("r2", "B", "l1", "A"), ("r1", "B", "l3", "A"))
      .toDF("source_id", "source_layer", "target_id", "target_layer")
    val g = OnionBuilder.grow(nodes, edges, GrowOptions())
    val out = VizData.bipartiteOrderedLayout(g, "A", "B")
      .filter(col("layer") === "B")
      .select("nodeId", "y").as[(String, Double)].collect().toMap
    assert(out == Map("r2" -> 0.0, "r1" -> 1.0))
  }

  test("forceLayout matches an independent integer reference and stays in box") {
    val es = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val edges = es.toDF("a", "b")
    val (box, cRep, attDiv, temp0, iters) = (1000000L, 200000000L, 10L, 200000L, 3)
    val got = VizData.forceLayout(edges, iters)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // independent reference: same model re-implemented with plain Scala
    // integer arithmetic (driver-side md5, truncating /)
    def h48(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(6)
      d.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val und = (es ++ es.map(_.swap)).distinct
    val nodes = und.map(_._1).distinct.sorted
    var pos = nodes.map(n => n -> (h48(n + ":x") % box, h48(n + ":y") % box)).toMap
    def tdiv(num: Long, den: Long): Long = num / den // Scala / truncates
    for (k <- 1 to iters) {
      val t = temp0 / k
      val next = nodes.map { n =>
        val (x, y) = pos(n)
        var fx = 0L; var fy = 0L
        nodes.filter(_ != n).foreach { m =>
          val (xj, yj) = pos(m)
          val (dx, dy) = (x - xj, y - yj)
          val d2 = math.max(dx * dx + dy * dy, 1L)
          fx += tdiv(dx * cRep, d2); fy += tdiv(dy * cRep, d2)
        }
        und.filter(_._1 == n).foreach { case (_, m) =>
          val (xj, yj) = pos(m)
          fx += -tdiv(x - xj, attDiv); fy += -tdiv(y - yj, attDiv)
        }
        def clamp(v: Long, lo: Long, hi: Long) = math.min(math.max(v, lo), hi)
        n -> (clamp(x + clamp(fx, -t, t), 0, box),
          clamp(y + clamp(fy, -t, t), 0, box))
      }.toMap
      pos = next
    }
    assert(got === pos)
    assert(got.values.forall { case (x, y) =>
      x >= 0 && x <= box && y >= 0 && y <= box })
    // pure function of the graph: partitioning can't move a vertex
    val again = VizData.forceLayout(edges.repartition(7), iters)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(again === got)
  }

  test("forceLayoutBinned with cell >= box degenerates to the exact layout") {
    // one cell holds everything -> every pair is Chebyshev-adjacent,
    // the far side is empty, and binned == exact EXACTLY
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "e"), ("e", "a")).toDF("a", "b")
    val exact = rows(VizData.forceLayout(edges, iters = 3))
    val binned = rows(VizData.forceLayoutBinned(edges, iters = 3,
      cell = 1000000L))
    assert(binned == exact)
  }

  test("forceLayoutBinned approximates exact within the temperature bound") {
    // each iteration's step is clamped to ±t, so binned and exact can
    // diverge per axis by at most 2·Σtₖ regardless of the grid
    val es = (0 until 40).map(i => (s"n$i", s"n${(i * 7 + 1) % 40}"))
    val edges = es.toDF("a", "b")
    val iters = 3
    val bound = 2L * (1 to iters).map(200000L / _).sum
    val exact = VizData.forceLayout(edges, iters)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val binned = VizData.forceLayoutBinned(edges, iters, cell = 125000L)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(binned.keySet == exact.keySet)
    binned.foreach { case (n, (bx, by)) =>
      val (ex, ey) = exact(n)
      assert(math.abs(bx - ex) <= bound && math.abs(by - ey) <= bound,
        s"$n diverged past the clamp bound: ($bx,$by) vs ($ex,$ey)")
    }
    // box clamp + partition invariance for the binned path too
    assert(binned.values.forall { case (x, y) =>
      x >= 0 && x <= 1000000L && y >= 0 && y <= 1000000L })
    val again = VizData.forceLayoutBinned(edges.repartition(7), iters,
      cell = 125000L)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(again === binned)
  }
}
