package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/**
 * Measures the incremental near-dup claim in SCALE.md: the ONE-TIME
 * index build scales with the corpus, the recurring probe scales with
 * the batch — so growing the corpus a decade must grow build cost,
 * not probe cost. Run against sf0.1 and the synthesized sf1
 * ([[SynthesizeScale]]) and compare the probe columns.
 *
 * The batch is a deterministic slice of the corpus re-keyed out of
 * the corpus id space (`doc_id + 10^12` — ids must be disjoint), so
 * batch size and content are IDENTICAL across corpus scales; any
 * probe-time growth is then attributable to the corpus side alone
 * (candidate verification against more duplicates is real output
 * growth, reported separately as pair count).
 *
 * Usage: runMain graft.tools.BenchBandIndex <sfDir> [batchN] [replicate]
 * `replicate` stacks the corpus N× with id strides (the
 * [[SynthesizeScale]] verbatim-copy convention, in-memory — no disk
 * SF needed) to reach decades the driver data doesn't cover.
 * Prints one JSON line: build/probe wall seconds + corpus/batch/pair
 * counts.
 */
object BenchBandIndex {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batchN = if (args.length > 1) args(1).toInt else 500
    val replicate = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val docStride = {
      val mx = base.agg(max(col("doc_id"))).head().getLong(0)
      var s = 10L; while (s <= mx) s *= 10; s
    }
    val docs =
      if (replicate <= 1) base
      else base.crossJoin(
          spark.range(replicate).select(col("id").as("replica")))
        .select((col("doc_id") + col("replica") * lit(docStride)).as("doc_id"),
          col("text"))
    val corpusN = docs.count()
    // smallest-id slice, re-keyed disjoint: same batch at every scale
    val batch = docs.orderBy("doc_id").limit(batchN)
      .withColumn("doc_id", col("doc_id") + lit(1000000000000L))
      .localCheckpoint() // batch prep is not what's being measured

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, buildSec) = timed(Dedup.writeBandIndex(docs, "bench_band_idx"))
    val (pairs, probeSec) = timed(
      Dedup.probeBandIndex("bench_band_idx", batch, threshold = 0.5).count())

    println(s"""{"corpus":$corpusN,"batch":$batchN,"pairs":$pairs,""" +
      s""""build_sec":${math.round(buildSec * 1000) / 1000.0},""" +
      s""""probe_sec":${math.round(probeSec * 1000) / 1000.0}}""")
    spark.stop()
  }
}
