package graft.views

import graft.model.OnionGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * S4 `export_info` (`exporter.py:13-98`): materialize the vertex or
 * edge table with all or selected property columns. The reference
 * loops per-item into pandas; here it's a projection — the "action"
 * (collect / write / toJSON) is the caller's choice, mirroring the
 * reference's `return_type` variants.
 */
object Exporter {

  /** Vertex export: identity columns + requested props (all non-key
    * columns when `props` is empty). */
  def vertexInfo(g: OnionGraph, props: Seq[String] = Nil): DataFrame = {
    val keep =
      if (props.nonEmpty) props
      else g.vertices.columns.toSeq.filterNot(Set("vid", "layer", "nodeId"))
    g.vertices.select((Seq("vid", "layer", "nodeId") ++ keep).map(col): _*)
  }

  /** Edge export: (source, target) endpoint identities + props
    * (the reference emits `(e_id, source, target)` tuples,
    * `exporter.py:70-87`; a stable synthetic e_id is derivable as
    * xxhash64(src,dst) when callers need one). */
  def edgeInfo(g: OnionGraph, props: Seq[String] = Nil): DataFrame = {
    val keep =
      if (props.nonEmpty) props
      else g.edges.columns.toSeq
        .filterNot(Set("src", "dst", "srcLayer", "srcId", "dstLayer", "dstId"))
    g.edges.select((Seq("src", "dst", "srcLayer", "srcId", "dstLayer", "dstId")
      ++ keep).map(col): _*)
  }

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** ORC sink — the other columnar built-in (predicate pushdown and
    * column pruning work the same as parquet; the choice is a
    * deployment concern, not an engine one). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** JSON-lines sink — the interchange format for row-oriented
    * consumers (the reference's dict/list export modes,
    * `exporter.py:81-96`, map to one JSON object per row). */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Partitioned parquet export — the 100 TB shape: `path/layer=X/…`
    * directories let every downstream layer-filtered read prune whole
    * partitions at planning time (PartitionFilters, zero data touched
    * for excluded layers), and `maxRecordsPerFile` bounds file sizes
    * under skewed layers (one giant layer must not become one giant
    * file). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String] = Seq("layer"),
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Graph datasheet — the [[graft.ext.Profiling.datasetCard]]
    * counterpart for graphs: (metric, value) rows, every value a
    * BIGINT so two cards from different ingest days diff meaningfully
    * and any engine re-derives the identical card. Structure-only
    * metrics (no closure): sizes, layer/relation vocabularies, degree
    * extremes, isolated-vertex count.
    *
    * Scale shape: a handful of map-side-combinable aggregations +
    * one anti-join for the isolated count; nothing collects, nothing
    * is quadratic. */
  def graphCard(g: OnionGraph): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    def row(metric: String, agg: Column, df: DataFrame): DataFrame =
      df.agg(coalesce(agg.cast("long"), lit(0L)).as("value"))
        .select(lit(metric).as("metric"), col("value"))
    val outd = g.edges.groupBy("src").agg(count(lit(1)).as("d"))
    val ind = g.edges.groupBy("dst").agg(count(lit(1)).as("d"))
    val touched = g.edges.select(col("src").as("vid"))
      .unionAll(g.edges.select(col("dst").as("vid"))).distinct()
    val isolated = g.vertices.join(touched, Seq("vid"), "left_anti")
    row("n_vertices", count(lit(1)), g.vertices)
      .unionAll(row("n_edges", count(lit(1)), g.edges))
      .unionAll(row("n_layers", count_distinct(col("layer")), g.vertices))
      // graphs without an explicit relation prop fall back to the
      // (source layer, target layer) pair vocabulary
      .unionAll(row("n_relations",
        if (g.edges.columns.contains("relation"))
          count_distinct(col("relation"))
        else count_distinct(struct(col("srcLayer"), col("dstLayer"))),
        g.edges))
      .unionAll(row("max_out_degree", max(col("d")), outd))
      .unionAll(row("max_in_degree", max(col("d")), ind))
      .unionAll(row("n_isolated", count(lit(1)), isolated))
  }
}
