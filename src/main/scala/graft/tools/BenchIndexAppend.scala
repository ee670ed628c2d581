package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the incremental inverted-index economics (x136 / SCALE.md):
  * full-corpus build vs appending a 10% batch — the append must cost
  * batch-sized work, not a corpus re-index.
  *
  * Usage: runMain graft.tools.BenchIndexAppend /root/testdata/sf0.1
  */
object BenchIndexAppend {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --synthetic N replaces the corpus with N generated ~24-token
    // docs (deterministic token soup) so the build/append gap is
    // data-dominated instead of session-overhead-dominated
    val synth = args.sliding(2).collectFirst {
      case Array("--synthetic", n) => n.toLong }
    val docs = (synth match {
      case Some(n) => spark.range(0, n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 24).map(i =>
          concat(lit("tok"), pmod(col("id") * (2 * i + 1) + i,
            lit(50000L)))): _*).as("text"))
      case None => spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
    }).repartition(cpus).localCheckpoint()
    // keep only the docs checkpoint alive between steps — each build's
    // internal postings checkpoint would otherwise pile up in the
    // block manager and starve execution memory (the Bench sweep)
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(
        f"[idx] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep.contains(id) }
        .foreach { case (_, rdd) => rdd.unpersist(false) }
    }
    timed("build_90pct") {
      graft.ext.TextOps.writeInvertedIndex(
        docs.where(col("doc_id") % 10 =!= 0), "benchidx")
    }
    timed("append_10pct") {
      graft.ext.TextOps.appendInvertedIndex(
        docs.where(col("doc_id") % 10 === 0), "benchidx")
    }
    // synthetic mode stops here: a third corpus-scale tokenize cycle
    // in the same harness JVM exhausts execution memory at 2M docs
    // (the 90%-build column already bounds the full rebuild at ×10/9)
    if (synth.isEmpty) {
      timed("rebuild_full") {
        graft.ext.TextOps.writeInvertedIndex(docs, "benchidx_full")
      }
      timed("search_appended") {
        graft.ext.TextOps.searchIndexBm25(spark, "benchidx",
          Seq("data", "hash", "batch"), 20).collect()
      }
    }
    spark.stop()
  }
}
