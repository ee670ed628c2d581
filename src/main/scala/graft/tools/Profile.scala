package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only profiler: run one corpus query with timing + plan dump.
  * Usage: runMain graft.tools.Profile <queryName> <sfDir> [explain] */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same serializer setup as Bench/Verify so profile timings
      // reproduce the bench environment (override: SPARK_GRAFT_SERIALIZER)
      .config(graft.SparkConfs.kryoGraphConf())
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("SPARK_GRAFT_WSCG", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (name == "ALL") graft.SparkEntry.defs.map(_.name)
                else name.split(",").toSeq
    names.foreach { q =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val t1 = System.nanoTime()
      if (args.contains("explain")) df.explain("formatted")
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"[profile] $q%-24s build ${(t1 - t0) / 1e9}%7.2f s  " +
        f"exec ${(t2 - t1) / 1e9}%7.2f s  ($n rows)")
    }
    spark.stop()
  }
}
