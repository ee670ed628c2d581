package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-job profiler: runs one corpus query with a listener
  * that prints every Spark job's wall time, task count and call site —
  * the breakdown Profile's single number hides for the iterative
  * kernels whose driver loop runs dozens of jobs per query.
  * Usage: runMain graft.tools.JobProfile <queryName> [sfDir] [repeat]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cteRecursionRowLimit", "100000000")
      .config("spark.ui.enabled", "false")
      .config(graft.SparkConfs.kryoGraphConf())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the shared ingest artifacts like Bench does, so the first
    // profiled run isn't charged for graph builds
    graft.builder.StarGraph.graph(spark, sfDir)
    graft.builder.StarGraph.copurchase(spark, sfDir)
    val keep = spark.sparkContext.getPersistentRDDs.keySet

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    @volatile var record = false
    val sb = new StringBuilder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (record) starts.put(js.jobId,
          (System.nanoTime(), Option(js.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (record) Option(starts.remove(je.jobId)).foreach { case (t0, cs) =>
          val ms = (System.nanoTime() - t0) / 1e6
          sb.synchronized { sb.append(
            f"[job] ${je.jobId}%4d ${ms}%9.1f ms  $cs%n") }
        }
    })

    for (r <- 1 to repeat) {
      starts.clear(); sb.clear(); record = true
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      record = false
      Thread.sleep(200) // let the listener bus drain
      println(sb.toString)
      println(f"[jobprofile] $name run $r build ${(t1 - t0) / 1e9}%7.2f s  " +
        f"exec ${(t2 - t1) / 1e9}%7.2f s  ($n rows)")
      // the bench's per-query unpersist sweep (checkpoint blocks etc.)
      val spare = keep ++ graft.algos.GraphOps.pinnedRddIds
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => spare.contains(id) }
        .foreach { case (_, rdd) => rdd.unpersist(false) }
    }
    spark.stop()
  }
}
