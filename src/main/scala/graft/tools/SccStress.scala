package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-topology stress for the SCC kernels (SCALE.md): a path
  * of m 3-cycles chained by one-way bridges — reachability diameter
  * ~2m, the worst case for ANY label-propagation SCC (rounds are
  * bounded below by the diameter; the layered dimensional graphs the
  * reference targets resolve entirely in the trim phase instead).
  * Measures wall for the DataFrame FW-BW kernel and (optionally) the
  * GraphX kernel at growing m, verifying the exact component count.
  *
  * Usage: runMain graft.tools.SccStress m1 [m2 ...] [--graphx]
  */
object SccStress {
  def main(args: Array[String]): Unit = {
    val withGraphx = args.contains("--graphx")
    val withWcc = args.contains("--wcc")
    val sizes = args.filterNot(_.startsWith("--")).map(_.toInt)
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.SparkConfs.kryoGraphConf())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (m <- sizes) {
      // cycle i = vertices 3i, 3i+1, 3i+2; bridge 3i+2 -> 3(i+1)
      val nodes = spark.range(0, 3L * m)
        .select(col("id").cast("string").as("node_id"), lit("L").as("layer"))
      val cyc = spark.range(0, m.toLong).select(
        explode(array(
          struct((col("id") * 3).as("s"), (col("id") * 3 + 1).as("d")),
          struct((col("id") * 3 + 1).as("s"), (col("id") * 3 + 2).as("d")),
          struct((col("id") * 3 + 2).as("s"), (col("id") * 3).as("d")))).as("e"))
        .select(col("e.s"), col("e.d"))
      val bridges = spark.range(0, m.toLong - 1)
        .select((col("id") * 3 + 2).as("s"), ((col("id") + 1) * 3).as("d"))
      val edges = cyc.unionAll(bridges)
        .select(col("s").cast("string").as("source_id"),
          lit("L").as("source_layer"),
          col("d").cast("string").as("target_id"),
          lit("L").as("target_layer"))
      val g = graft.builder.OnionBuilder.grow(nodes, edges,
        graft.builder.OnionBuilder.GrowOptions())
      g.vertices.count(); g.edges.count()

      def timedN(name: String, want: Long)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val comps = f
        val sec = (System.nanoTime() - t0) / 1e9
        val ok = if (comps == want) "ok" else s"WRONG ($comps != $want)"
        System.err.println(
          f"[scc] m=$m%-7d diam~${2 * m}%-7d $name%-12s $sec%9.2f s  comps=$comps $ok")
      }
      def timed(name: String)(f: => Long): Unit = timedN(name, m.toLong)(f)
      // logstar-only mode skips BOTH Ω(diameter) kernels — at the
      // mega-diameter sizes that mode exists for, the SCC kernel alone
      // would run for hours (0.4 s/m measured)
      if (!args.contains("--wcc-logstar-only")) timed("dataframe") {
        graft.algos.Traversals.strongComponentsDataFrame(g)
          .select("compVid").distinct().count()
      }
      if (withWcc) {
        // the SAME chain is one weak component: label propagation pays
        // the diameter in rounds, star contraction pays ~log m
        timedN("wcc_lprop", 1L) {
          graft.algos.Traversals.weakComponentsDataFrame(g)
            .select("comp").distinct().count()
        }
        timedN("wcc_logstar", 1L) {
          graft.algos.Traversals.weakComponentsLogRounds(g)
            .select("comp").distinct().count()
        }
      }
      if (args.contains("--wcc-logstar-only")) {
        // mega-diameter sizes where the Ω(diameter) label loop is
        // outright infeasible (m=1024 already cost it 1,347 s): run
        // only the O(log n) kernel — the engine's weak-components
        // DEFAULT since round 10 — through the facade entry point
        timedN("wcc_default", 1L) {
          graft.algos.Traversals.weakComponents(g)
            .select("comp").distinct().count()
        }
      }
      if (withGraphx) timed("graphx") {
        // numIter must cover the chain or the answer is silently wrong
        graft.algos.GraphOps.stronglyConnectedComponents(g, numIter = 4 * m)
          .select("compVid").distinct().count()
      }
    }
    spark.stop()
  }
}
