package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Sampling

/**
 * Measures the round-13 export-retirement leg (X129) a decade above
 * the bench SF (SCALE.md round-13 section): documents stack N× in
 * memory with id strides (the [[SynthesizeScale]] convention), land
 * in a frozen-bounds Z-order layout whose a-dimension is the raw id
 * (so a low-id "source" clusters in the low-qa Z-range shards), and
 * each lifecycle phase times at ×1 and ×N.
 *
 * The claims under measurement:
 *  - the EXPORT write is corpus-linear (it is the layout);
 *  - RETIREMENT of a clustered source costs the affected shards'
 *    rewrite, not a corpus rewrite (the affected/total shard split is
 *    printed — the prune is the 100 TB lever: dropping one crawl
 *    never touches the other crawls' files);
 *  - a REPLAY of the completed retirement is flat (tombstone
 *    anti-join short-circuits to a manifest read).
 *
 * Usage: runMain graft.tools.BenchRetire <sfDir> [factor]
 * Prints one JSON line per (op, scale) with wall seconds + rows.
 */
object BenchRetire {
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

    def timed(name: String, scale: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","scale":$scale,"secs":$secs%.2f,"rows":$rows}""")
    }

    // JIT/codegen warmup on a slice, so the ×1 pass isn't measuring
    // cold-JVM compile time against a warm ×N pass
    {
      val w = docs0.limit(500)
      val base = java.nio.file.Files
        .createTempDirectory("benchretire_warm").toString
      Sampling.zorderShards(
          w.withColumn("a", col("doc_id")).withColumn("b", lit(1L)),
          "a", "b", bits = 8, shards = 16)
        .write.mode("overwrite").partitionBy("shard")
        .parquet(s"$base/layout")
      Sampling.retireFromShards(spark, s"$base/layout",
        w.limit(50).select("doc_id"), "doc_id", "text").count()
    }

    Seq(1, factor).foreach { n =>
      val docs = replicate(docs0, "doc_id", n).localCheckpoint()
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val d = docs
        .withColumn("a", col("doc_id"))
        .withColumn("b",
          pmod(size(split(trim(col("text")), "\\s+")), lit(1024))
            .cast("long"))
      val base = java.nio.file.Files
        .createTempDirectory(s"benchretire_x$n").toString
      val path = s"$base/layout"
      timed("zorder_export", n) {
        Sampling.zorderShards(d, "a", "b", bits = 8, shards = 16)
          .write.mode("overwrite").partitionBy("shard").parquet(path)
        spark.read.parquet(path).count()
      }
      // the retired "source": the lowest-id eighth of the corpus —
      // clustered in a-space, so only the low-qa Z-ranges rewrite
      val source = docs.where(col("doc_id") <= maxId / 8)
        .select("doc_id").localCheckpoint()
      val totalShards = 16
      val affected = spark.read.parquet(path)
        .join(broadcast(source), Seq("doc_id"), "left_semi")
        .select("shard").distinct().count()
      println(s"""{"op":"affected_shards","scale":$n,"affected":$affected,"total":$totalShards}""")
      timed("retire_source", n) {
        Sampling.retireFromShards(spark, path, source, "doc_id", "text")
          .count()
      }
      timed("retire_replay", n) {
        Sampling.retireFromShards(spark, path, source, "doc_id", "text")
          .count()
      }
    }
    spark.stop()
  }
}
