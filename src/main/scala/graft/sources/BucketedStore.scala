package graft.sources

import graft.model.OnionGraph
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucketed persistence for an [[OnionGraph]]: vertices bucketed by
 * `vid`, edges bucketed by `src`, both sorted in-bucket.
 *
 * This is the 100 TB co-location story (SURVEY §4 physical notes):
 * with matching bucket counts, vertex⋈edge joins (induced subgraphs,
 * degree joins, every BFS round's frontier⋈edges probe) plan WITHOUT a
 * shuffle exchange on the bucketed side — the join happens bucket-to-
 * bucket. `BucketedStoreSpec` asserts the exchange disappears.
 */
object BucketedStore {

  def save(g: OnionGraph, name: String, buckets: Int = 32): Unit = {
    val spark = g.spark
    spark.sql(s"DROP TABLE IF EXISTS ${name}_vertices")
    spark.sql(s"DROP TABLE IF EXISTS ${name}_edges")
    g.vertices.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "vid").sortBy("vid")
      .format("parquet").saveAsTable(s"${name}_vertices")
    g.edges.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "src").sortBy("src")
      .format("parquet").saveAsTable(s"${name}_edges")
  }

  def load(spark: SparkSession, name: String): OnionGraph =
    OnionGraph(spark.table(s"${name}_vertices"), spark.table(s"${name}_edges"))
}
