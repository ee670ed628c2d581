package graft.viz

import graft.model.OnionGraph
import graft.props.PropertyOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The DATA side of the reference's visual-analytics module
 * (`visualisation.py`): palettes, sizes and layouts as columns.
 * Rendering (Cairo/matplotlib) is out of scope (SURVEY preamble); every
 * computation feeding it is here, as pure column math — no UDFs, fully
 * codegen'd.
 *
 * Determinism deltas vs the reference (SURVEY §7.4): category->color
 * assignment iterates SORTED categories (reference iterates a Python
 * set, `visualisation.py:136-139`); layout jitter takes an explicit
 * seed (reference uses unseeded `np.random.uniform`,
 * `visualisation.py:522-525`).
 */
object VizData {

  /** Default palette indices stand in for the reference's matplotlib
    * palette cycling (`visualisation.py:136-139`): the engine emits the
    * palette INDEX; callers map index -> RGBA client-side. */
  val DefaultPaletteSize = 10

  /** V1 categorical: deterministic code (sorted distinct) modulo the
    * palette length. Adds `<prop>_color_idx`. */
  def colorCategorical(df: DataFrame, prop: String,
                       paletteSize: Int = DefaultPaletteSize): DataFrame =
    PropertyOps.encodeCategorical(df, prop)
      .withColumn(s"${prop}_color_idx", col(s"${prop}_code") % paletteSize)
      .drop(s"${prop}_code")

  /** V1 continuous: min/max-normalize into [0,1]; `zeroCentred` makes
    * the range symmetric around 0 (`visualisation.py:150-153`,
    * `:472-475`). Constant columns normalize to 0.5. */
  def colorContinuous(df: DataFrame, prop: String,
                      zeroCentred: Boolean = false): DataFrame = {
    val Row2 = df.agg(min(col(prop)).cast("double"), max(col(prop)).cast("double")).head
    val (mn, mx) =
      if (Row2.isNullAt(0)) (0.0, 0.0) else (Row2.getDouble(0), Row2.getDouble(1))
    val (lo, hi) =
      if (zeroCentred) { val m = math.max(math.abs(mn), math.abs(mx)); (-m, m) }
      else (mn, mx)
    val norm =
      if (hi == lo) lit(0.5)
      else (col(prop).cast("double") - lit(lo)) / lit(hi - lo)
    df.withColumn(s"${prop}_color_val", norm)
  }

  /** V1 custom color dict with STRICT missing-key error
    * (`visualisation.py:128-130` raises ValueError): unknown category
    * values fail the job via raise_error instead of silently
    * defaulting. */
  def colorByMap(df: DataFrame, prop: String,
                 colors: Map[String, String]): DataFrame = {
    val cases = colors.foldLeft(lit(null).cast("string")) {
      case (acc, (k, v)) => when(col(prop) === k, lit(v)).otherwise(acc)
    }
    df.withColumn(s"${prop}_color",
      coalesce(cases, raise_error(concat(
        lit(s"no color for $prop value: "), col(prop).cast("string")))))
  }

  /** V1 boolean: true -> index 0 ("red"), false -> 1 ("grey"). */
  def colorBoolean(df: DataFrame, prop: String): DataFrame =
    df.withColumn(s"${prop}_color_idx", when(col(prop), 0).otherwise(1))

  /** V2: categorical -> cycled shape index (`visualisation.py:177-233`). */
  def shapeNodes(df: DataFrame, prop: String, nShapes: Int = 7): DataFrame =
    PropertyOps.encodeCategorical(df, prop)
      .withColumn(s"${prop}_shape_idx", col(s"${prop}_code") % nShapes)
      .drop(s"${prop}_code")

  /** V3: halo flags true only for one vertex (`visualisation.py:236-270`). */
  def addHalo(g: OnionGraph, layer: String, nodeId: String): OnionGraph =
    g.copy(vertices = g.vertices.withColumn("halo",
      col("layer") === layer && col("nodeId") === nodeId))

  /** V7 `prop_to_size` (`visualisation.py:734-790`): min/max-scale a
    * numeric column into [mi, ma] with optional power transform;
    * constant column -> all mi (`visualisation.py:776-777`). */
  def propToSize(df: DataFrame, prop: String, mi: Double, ma: Double,
                 power: Double = 1.0): DataFrame = {
    val v = pow(col(prop).cast("double"), lit(power))
    val stats = df.agg(min(v), max(v)).head
    val (mn, mx) =
      if (stats.isNullAt(0)) (0.0, 0.0) else (stats.getDouble(0), stats.getDouble(1))
    val scaled =
      if (mx == mn) lit(mi)
      else lit(mi) + (v - lit(mn)) / lit(mx - mn) * lit(ma - mi)
    df.withColumn(s"${prop}_size", scaled)
  }

  /** V5 `layout_by_layer` (`visualisation.py:499-536`): x = layer rank ×
    * spacing (layers sorted, `visualisation.py:515-516`), y = even
    * spacing within the layer + optional seeded jitter. The window is
    * partitioned BY LAYER so no global sort bottleneck; within-layer
    * order is the deterministic nodeId sort. */
  def layoutByLayer(vertices: DataFrame, xSpacing: Double = 1.0,
                    ySpacing: Double = 1.0, jitter: Double = 0.0,
                    seed: Long = 42L): DataFrame = {
    // layer rank via broadcast code table, NOT a global unpartitioned
    // window (which would funnel every vertex through one task)
    val wInLayer = Window.partitionBy(col("layer")).orderBy(col("nodeId"))
    val base = vertices
      .join(broadcast(OnionGraph.layerCodes(vertices)), Seq("layer"))
      .withColumn("x", col("layerCode").cast("double") * xSpacing)
      .drop("layerCode")
      .withColumn("y", (row_number().over(wInLayer) - 1).cast("double") * ySpacing)
    if (jitter == 0.0) base
    else base.withColumn("y", col("y") + (rand(seed) - 0.5) * 2 * jitter)
  }

  /** V6 `bipartite_ordered_layout` (`visualisation.py:539-622`):
    * left column ordered by key; right column ordered by the MEAN index
    * of its left neighbors (one-pass barycenter crossing reduction,
    * `visualisation.py:597-609`). Returns (vid, layer, nodeId, x, y).
    * One join + one agg + two layer-local windows — no global sort. */
  def bipartiteOrderedLayout(g: OnionGraph, leftLayer: String,
                             rightLayer: String): DataFrame = {
    val left = g.vertices.filter(col("layer") === leftLayer)
      .withColumn("y",
        (row_number().over(
          Window.partitionBy(col("layer")).orderBy(col("nodeId"))) - 1)
          .cast("double"))
      .select(col("vid"), col("layer"), col("nodeId"), lit(0.0).as("x"), col("y"))
    // neighbors of a right vertex on either edge orientation
    val touchingLeft = g.edges
      .filter(col("srcLayer") === rightLayer && col("dstLayer") === leftLayer)
      .select(col("src").as("rvid"), col("dst").as("lvid"))
      .unionAll(g.edges
        .filter(col("srcLayer") === leftLayer && col("dstLayer") === rightLayer)
        .select(col("dst").as("rvid"), col("src").as("lvid")))
    val bary = touchingLeft
      .join(left.select(col("vid").as("lvid"), col("y").as("ly")), Seq("lvid"))
      .groupBy("rvid").agg(avg("ly").as("bary"))
    val right = g.vertices.filter(col("layer") === rightLayer)
      .join(bary.withColumnRenamed("rvid", "vid"), Seq("vid"), "left")
      .na.fill(Map("bary" -> Double.MaxValue))
      .withColumn("y",
        (row_number().over(Window.partitionBy(col("layer"))
          .orderBy(col("bary"), col("nodeId"))) - 1).cast("double"))
      .select(col("vid"), col("layer"), col("nodeId"), lit(1.0).as("x"), col("y"))
    left.unionByName(right)
  }

  /** S5 layout persistence (`load_or_compute_layout`,
    * `visualisation.py:625-732`): parquet keyed by (layer, nodeId). */
  def saveLayout(layout: DataFrame, path: String): Unit =
    layout.select("layer", "nodeId", "x", "y")
      .write.mode("overwrite").parquet(path)

  def loadLayout(g: OnionGraph, path: String): DataFrame =
    g.vertices.join(g.spark.read.parquet(path), Seq("layer", "nodeId"), "left")
}
