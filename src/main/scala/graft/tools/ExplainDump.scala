package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper for the optimization-round evidence files:
  * writes each named query's `.explain("formatted")` output to
  * <outDir>/<query>_<tag>.txt. Building a query runs its eager
  * driver loop (checkpoints), so the dumped plan is the final
  * serving/combination subtree — the per-round shapes are asserted by
  * ScaleSpec plan pins instead.
  * Usage: runMain graft.tools.ExplainDump <outDir> <tag> <q1,q2,...> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.ui.enabled", "false")
      .config(graft.SparkConfs.kryoGraphConf())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.builder.StarGraph.graph(spark, sfDir)
    graft.builder.StarGraph.copurchase(spark, sfDir)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${q}_$tag.txt"), plan)
      System.err.println(s"[explain] wrote ${q}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
