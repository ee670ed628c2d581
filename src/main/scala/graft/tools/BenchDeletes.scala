package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Clustering, TextOps}

/**
 * Measures the round-12 delete/compaction legs a decade above the
 * bench SF (SCALE.md round-12 section): corpus and embeddings stack
 * N× in memory with id strides (the [[SynthesizeScale]] convention),
 * and each lifecycle phase times at ×1 and ×N for two families.
 *
 * The claims under measurement:
 *  - probe/search cost with LIVE TOMBSTONES ≈ the clean cost at both
 *    scales (the anti-join side broadcasts — a delete must never make
 *    reads corpus-quadratic or add an exchange);
 *  - the inverted delete itself costs one postings pass (scales with
 *    the corpus — the honest price of EXACT df/stats retraction),
 *    while the binary delete is a tombstone append (flat);
 *  - compaction is one surviving-rows rewrite (~linear I/O), after
 *    which the probe returns to the clean cost.
 *
 * Usage: runMain graft.tools.BenchDeletes <sfDir> [factor]
 * Prints one JSON line per (op, scale) with wall seconds + rows.
 */
object BenchDeletes {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stride(df: DataFrame, c: String): Long = {
      val mx = df.agg(max(col(c))).head().getLong(0)
      var s = 10L; while (s <= mx) s *= 10; s
    }
    def replicate(df: DataFrame, idCol: String, n: Int): DataFrame =
      if (n <= 1) df
      else {
        val s = stride(df, idCol)
        df.crossJoin(spark.range(n).select(col("id").as("__r")))
          .withColumn(idCol, col(idCol) + col("__r") * s)
          .drop("__r")
      }

    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")

    def timed(name: String, scale: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","scale":$scale,"secs":$secs%.2f,"rows":$rows}""")
    }

    for (n <- Seq(1, factor)) {
      val docs = replicate(docs0, "doc_id", n)
        .repartition(spark.sparkContext.defaultParallelism).cache()
      val emb = replicate(emb0, "vec_id", n)
        .repartition(spark.sparkContext.defaultParallelism).cache()
      docs.count(); emb.count()
      val terms = Seq("data", "hash", "batch")

      // ---- inverted index lifecycle
      TextOps.writeInvertedIndex(docs, s"benchdel_idx_$n")
      timed("inv_search_clean", n) {
        TextOps.searchIndexBm25(spark, s"benchdel_idx_$n", terms, 20).count()
      }
      timed("inv_delete_1pct", n) {
        TextOps.deleteIndexDocs(spark, s"benchdel_idx_$n",
          docs.where(col("doc_id") % 100 === 0).select("doc_id"))
        spark.table(s"benchdel_idx_${n}_tombstones").count()
      }
      timed("inv_search_tombstoned", n) {
        TextOps.searchIndexBm25(spark, s"benchdel_idx_$n", terms, 20).count()
      }
      timed("inv_compaction", n) {
        TextOps.compactInvertedIndex(spark, s"benchdel_idx_$n")
        spark.table(s"benchdel_idx_${n}_doclen").count()
      }
      timed("inv_search_compacted", n) {
        TextOps.searchIndexBm25(spark, s"benchdel_idx_$n", terms, 20).count()
      }

      // ---- binary ANN lifecycle
      val binPath = java.nio.file.Files
        .createTempDirectory(s"benchdel_bin_$n").toString
      Clustering.writeBinaryIndex(emb, binPath, dims = 64)
      val q = emb.where(col("vec_id") < 5)
      timed("bin_probe_clean", n) {
        Clustering.probeBinaryIndex(spark, binPath, emb, q, dims = 64,
          rerankR = 50, topK = 10).count()
      }
      timed("bin_delete_1pct", n) {
        Clustering.deleteBinaryIndex(spark, binPath,
          emb.where(col("vec_id") % 100 === 7).select("vec_id"))
        spark.read.parquet(s"$binPath/tombstones").count()
      }
      timed("bin_probe_tombstoned", n) {
        Clustering.probeBinaryIndex(spark, binPath, emb, q, dims = 64,
          rerankR = 50, topK = 10).count()
      }
      timed("bin_compaction", n) {
        Clustering.compactBinaryIndex(spark, binPath)
        spark.read.parquet(s"$binPath/codes").count()
      }
      timed("bin_probe_compacted", n) {
        Clustering.probeBinaryIndex(spark, binPath, emb, q, dims = 64,
          rerankR = 50, topK = 10).count()
      }

      docs.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
