package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the binary-quantization retrieval economics (x152 /
  * SCALE.md): against a PERSISTED [[graft.ext.Clustering
  * .writeBinaryIndex]] layout, the probe's per-query work is a
  * popcount over 16-byte code words plus an exact rerank of R
  * survivors, where brute exact search pays the full dims-wide
  * distance per (query, corpus) pair. Both paths scan the corpus
  * once per batch; the slope that matters is QUERY-BATCH size — the
  * brute pair aggregation grows with queries × corpus × dims while
  * the probe grows with queries × corpus (popcounts) + queries × R ×
  * dims (rerank). Build time is reported separately (it amortizes
  * over every future probe — the x137 economics).
  *
  * Usage: runMain graft.tools.BenchBinaryQuant [n] [factor] [queries]
  *   n = base corpus vectors (default 200000), ×`factor` second leg,
  *   `queries` per batch (default 100).
  */
object BenchBinaryQuant {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(200000L)
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val nQ = args.drop(2).headOption.map(_.toInt).getOrElse(100)
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dims = 64
    def corpus(n: Long) = spark.range(0, n)
      .select(col("id").as("vec_id"),
        expr(s"""transform(sequence(0, ${dims - 1}), d ->
                 | CAST((pmod(xxhash64(id * 64 + d), 2000) - 1000)
                 |   / 1000.0 AS FLOAT))""".stripMargin).as("embedding"))
      .localCheckpoint() // materialize: measure retrieval, not synthesis

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (n <- Seq(nBase, nBase * factor)) {
      val emb = corpus(n)
      val q = emb.where(col("vec_id") < nQ)
      val path = java.nio.file.Files
        .createTempDirectory(s"binquant_$n").toString
      val (_, tBuild) = time(
        graft.ext.Clustering.writeBinaryIndex(emb, path, dims))
      val (_, tProbe) = time(
        graft.ext.Clustering.probeBinaryIndex(spark, path, emb, q, dims,
          rerankR = 100, topK = 10).count())
      val (_, tExact) = time(
        graft.ext.Clustering.exactL2TopK(emb, q, 10).count())
      println(f"[binquant] n=$n%d queries=$nQ%d build=$tBuild%.2fs " +
        f"probe=$tProbe%.2fs exactL2=$tExact%.2fs")
    }
    spark.stop()
  }
}
