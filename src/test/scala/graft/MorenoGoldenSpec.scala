package graft

import graft.builder.OnionBuilder
import graft.builder.OnionBuilder.GrowOptions
import graft.algos.Traversals
import graft.model.OnionGraph
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Golden end-to-end on the reference's own example dataset
  * (FIXTURES.md §A): three Moreno sociogram grades ingested as layers.
  * This is SURVEY §7.2's minimum end-to-end slice. */
class MorenoGoldenSpec extends SparkSuite {

  private val base = "/root/reference/.data/example_moreno_sociograms"

  private def haveData = new java.io.File(s"$base/grade_1/nodes.csv").exists()

  /** CSV headers are "# index, name, _pos" — strip the comment marker
    * and pad; ingest shape per builder.py:46-51 defaults. */
  private def grade(k: Int): (DataFrame, DataFrame) = {
    val n = spark.read.option("header", "true").csv(s"$base/grade_$k/nodes.csv")
      .withColumnRenamed("# index", "idx")
      .withColumnRenamed(" name", "name")
      .select(trim(col("idx")).as("idx"), trim(col("name")).as("name"))
      .withColumn("layer", lit(s"grade_$k"))
    val e = spark.read.option("header", "true").csv(s"$base/grade_$k/edges.csv")
      .withColumnRenamed("# source", "src")
      .withColumnRenamed(" target", "tgt")
      .select(trim(col("src")).as("src"), trim(col("tgt")).as("tgt"))
      .withColumn("layer", lit(s"grade_$k"))
    (n, e)
  }

  private lazy val g: OnionGraph = {
    val grades = Seq(1, 2, 3).map(grade)
    val nodes = grades.map(_._1).reduce(_ unionByName _)
      .select(col("name").as("node_id"), col("layer"))
    // resolve edge endpoints index->name through the per-grade node list
    val edges = grades.map(_._2).reduce(_ unionByName _)
    val idx = grades.map(_._1).reduce(_ unionByName _)
      .select(col("idx"), col("name"), col("layer"))
    val resolved = edges
      .join(idx.withColumnRenamed("idx", "src").withColumnRenamed("name", "source_id"),
        Seq("src", "layer"))
      .join(idx.withColumnRenamed("idx", "tgt").withColumnRenamed("name", "target_id"),
        Seq("tgt", "layer"))
      .select(col("source_id"), col("layer").as("source_layer"),
        col("target_id"), col("layer").as("target_layer"))
    OnionBuilder.grow(nodes, resolved, GrowOptions())
  }

  test("golden vertex/edge counts: 97 nodes, 190 edges in 3 layers") {
    assume(haveData)
    assert(g.numVertices == 97)
    assert(g.numEdges == 190)
    assert(rows(g.layers.select("layer")) ==
      Set(Seq("grade_1"), Seq("grade_2"), Seq("grade_3")))
  }

  test("per-layer counts match the reference fixture") {
    assume(haveData)
    val byLayer = g.vertices.groupBy("layer").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLayer == Map("grade_1" -> 35L, "grade_2" -> 29L, "grade_3" -> 33L))
  }

  test("grades are disconnected: components never span layers") {
    assume(haveData)
    val comps = Traversals.weakComponents(g)
      .join(g.vertices, Seq("vid"))
    val span = comps.groupBy("comp")
      .agg(countDistinct("layer").as("nl"))
      .filter(col("nl") > 1)
    assert(span.count() == 0)
  }

  test("k-hop ego net from GO1 stays inside grade_1") {
    assume(haveData)
    val ego = Traversals.egoNet(g, "grade_1", "GO1", 2, Traversals.Downstream)
    assert(ego.numVertices > 1)
    assert(rows(ego.vertices.select("layer")) == Set(Seq("grade_1")))
  }
}
