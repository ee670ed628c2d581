package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe: print exchange/join counts of named SparkEntry
  * queries' FINAL plans (the serving subtree a refactor could fatten)
  * — used to set the ScaleSpec bench-query plan pins (r11 verdict
  * #8). Test-tree only: never ships in the library jar. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("x142_ivf_pq_append", "g68_leiden_two_level",
        "g39_betweenness", "x93_mutual_knn_clusters",
        "x155_hybrid_diversified")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.SparkConfs.kryoGraphConf())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      def c(p: String) = p.r.findAllIn(plan).length
      println(s"PLAN $n exchanges=${c("Exchange hashpartitioning")} " +
        s"bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} " +
        s"bnlj=${c("BroadcastNestedLoopJoin")} " +
        s"rangeEx=${c("Exchange rangepartitioning")}")
    }
    spark.stop()
  }
}
