package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling, TextOps}

/**
 * Measures the round-8 curation operators' scale behavior a decade
 * above the bench SF (SCALE.md): corpus and embeddings are stacked
 * N× in memory with id strides (the [[SynthesizeScale]] verbatim-copy
 * convention), and each operator runs at ×1 and ×N.
 *
 * The interesting claims under verbatim ×N replication:
 *  - BPE training cost is HISTOGRAM-sized: replication multiplies
 *    counts, not vocabulary, so wall time must stay ~flat;
 *  - semanticDedup at FIXED k is quadratic within clusters (Σ n_c²) —
 *    the measured blow-up — while k ∝ corpus (the SemDeDup paper's
 *    rule) restores bounded clusters: both are measured;
 *  - capPerGroup / scoreLinear / matchDistribution / epochShuffle are
 *    map-only or single-exchange and must scale ~linearly in I/O.
 *
 * Usage: runMain graft.tools.BenchCuration <sfDir> [factor]
 * Prints one JSON line per (op, scale) with wall seconds + output rows.
 */
object BenchCuration {
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

      timed("bpe_train_10r", n) {
        TextOps.learnBpeMerges(docs, rounds = 10).count()
      }
      timed("cap_per_group_k10", n) {
        Sampling.capPerGroup(docs, "source", "doc_id", 10).count()
      }
      timed("score_linear", n) {
        val w = TextOps.trainLinearWeights(docs, col("lang") === "en",
          minDf = 3)
        TextOps.scoreLinear(docs, w).count()
      }
      timed("match_distribution", n) {
        Sampling.matchDistribution(docs.filter(col("lang") =!= "en"),
          docs.filter(col("lang") === "en"), "n_chars", 200L,
          "doc_id").count()
      }
      timed("epoch_shuffle", n) {
        Sampling.epochShuffle(docs, "doc_id", 1, 64).count()
      }
      timed("semantic_dedup_k4", n) {
        Dedup.semanticDedup(emb, k = 4, threshold = 0.35).count()
      }
      // the paper's rule: k grows with the corpus so clusters stay
      // bounded — candidate volume Σ n_c² then scales ~linearly
      timed(s"semantic_dedup_k${4 * n}", n) {
        Dedup.semanticDedup(emb, k = 4 * n, threshold = 0.35).count()
      }
      // knn rides the same cell shape; k cells ∝ corpus keeps the
      // in-cell pair join bounded
      timed(s"knn_classify_cells${4 * n}", n) {
        graft.ext.Similarity.knnClassify(emb, k = 5, cells = 4 * n).count()
      }
      // the DERIVED default (autoCells = max(4, n/128)) must land on
      // the ~linear regime without the caller choosing anything
      timed("semantic_dedup_auto", n) {
        Dedup.semanticDedup(emb, threshold = 0.35).count()
      }
      timed("knn_classify_auto", n) {
        graft.ext.Similarity.knnClassify(emb, k = 5).count()
      }
      timed("profile_merge_3way", n) {
        val states = (0 until 3).map(i => graft.ext.Profiling.profileState(
          docs.filter(pmod(col("doc_id"), lit(3)) === i), "doc_id",
          Seq("n_chars"), sampleK = 500))
        graft.ext.Profiling.finalizeProfile(
          states.reduce(graft.ext.Profiling.mergeStates),
          Seq("n_chars")).count()
      }
      docs.unpersist(); emb.unpersist()
    }
    spark.stop()
  }
}
