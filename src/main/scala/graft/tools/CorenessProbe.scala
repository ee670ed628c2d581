package graft.tools

import org.apache.spark.sql.SparkSession

/** Convergence probe for g64's bounded-round coreness contract
  * (r9 ADVICE): at each given SF dir, run the co-purchase core
  * decomposition at the corpus bound and report how many values still
  * changed in the FINAL round — 0 means the published values are the
  * exact coreness at that scale, not a silent upper bound. Results go
  * into SCALE.md next to the measured round-decay comment.
  *
  * Usage: runMain graft.tools.CorenessProbe /root/testdata/sf0.01 [dirs...] [--rounds N]
  */
object CorenessProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.sliding(2).collectFirst {
      case Array("--rounds", n) => n.toInt }.getOrElse(10)
    val dirs = args.filterNot(_.startsWith("--"))
      .filterNot(a => a.forall(_.isDigit))
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.SparkConfs.kryoGraphConf())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- dirs) {
      val pairs = graft.algos.LinkAnalysis.cooccurrenceFromGi(
        graft.builder.StarGraph.copurchaseGi(spark, dir), 2)
        .select("a", "b").localCheckpoint()
      val t0 = System.nanoTime()
      val changed = graft.algos.LinkAnalysis
        .corenessLastRoundChanges(pairs, rounds)
      val sec = (System.nanoTime() - t0) / 1e9
      val verdict = if (changed == 0) "fixpoint" else "NOT CONVERGED"
      System.err.println(
        f"[coreness] dir=$dir%-28s rounds=$rounds%-3d changed_last_round=$changed%-6d $verdict ($sec%.1f s)")
    }
    spark.stop()
  }
}
