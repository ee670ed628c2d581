package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the residual-encoding recall gain (x139 vs x137 / SCALE.md):
  * the recall-vs-nProbe card over the SAME corpus, queries and bit
  * budget, raw-vector codes vs residual codes — IVFADC's claim is that
  * residual codebooks spend their centroids on the tighter within-cell
  * distribution, so recall@k at fixed nProbe should not be worse.
  *
  * Usage: runMain graft.tools.RecallGain [sfDir] [cells] [m] [k]
  */
object RecallGain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cells = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val m = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val k = args.drop(3).headOption.map(_.toInt).getOrElse(16)
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --clustered N: replace the corpus with N vectors drawn as
    // 16 deterministic cluster centers + small per-vector offsets —
    // the regime IVFADC's residual claim is ABOUT (real embedding
    // corpora are clustered; the driver's synthetic ones are not)
    val clustered = args.sliding(2).collectFirst {
      case Array("--clustered", n) => n.toLong }
    val emb = (clustered match {
      case Some(n) => spark.range(0, n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          // center(id%16, d) in [-4, 4] + offset in [-0.2, 0.2]
          (pmod(pmod(col("id"), lit(16L)) * 37 + d * 11, lit(800L))
            .cast("double") / 100.0 - 4.0) +
          (pmod(col("id") * 13 + d * 7, lit(40L)).cast("double")
            / 100.0 - 0.2)).cast("array<float>").as("embedding"))
      case None => spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
    }).localCheckpoint()
    // hash-sampled query slice (content-keyed, the engine convention)
    val queries = emb.where(pmod(xxhash64(col("vec_id")), lit(20L)) === 0)
      .localCheckpoint()
    System.err.println(s"[recall] corpus=${emb.count()} " +
      s"queries=${queries.count()} cells=$cells m=$m k=$k")
    for (res <- Seq(false, true)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"recall_$res").toString
      graft.ext.Clustering.writeIvfPq(emb, path, dims = 64, cells = cells,
        m = m, k = k, iters = 2, residual = res)
      val card = graft.ext.Clustering.ivfPqRecallCard(spark, path, emb,
          queries, dims = 64, nProbes = Seq(1, 2, 4, cells), m = m,
          topK = 10, residual = res)
        .orderBy("n_probe").collect()
      card.foreach { r =>
        System.err.println(f"[recall] residual=$res%-5s nProbe=${r.getInt(0)}%2d " +
          f"mean_recall_ppm=${r.getLong(3)}%7d")
      }
    }
    spark.stop()
  }
}
