package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-level wall-clock profile of the shared bench ingest (star
  * graph build, GraphX projection, co-purchase artifacts) — the
  * pre-query cost that dominated the sf10 decade wall (SCALE.md).
  * Usage: runMain graft.tools.ProfileIngest <sfDir>
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.SparkConfs.kryoGraphConf())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[ingest] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val g = phase("star graph build+persist") {
      graft.builder.StarGraph.graph(spark, sfDir)
    }
    phase("vertices recount") { g.vertices.count() }
    phase("edges recount") { g.edges.count() }
    phase("copurchase membership+proj") {
      graft.builder.StarGraph.copurchase(spark, sfDir).count()
    }
    // END of the ingest path a relational/pipeline-only workload pays.
    // The GraphX projection is LAZY: it builds (memoized) on first
    // Pregel/PageRank/components use — profiled separately below so
    // the moved cost stays visible.
    val gx = phase("first GraphX use (lazy projection)") {
      val gx = graft.algos.GraphOps.toGraphX(g)
      gx.vertices.count(); gx.edges.count()
      gx
    }
    System.err.println(s"[ingest] done: ${gx.edges.count()} gx edges")
    spark.stop()
  }
}
