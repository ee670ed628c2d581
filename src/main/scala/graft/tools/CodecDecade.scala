package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade measurement for the codec-bound video cards (r9 verdict #7):
  * synthesize n PNG-in-AVI clips (4 frames each — the x122 shape),
  * run frame-hash + shot-boundary detection, and report wall at n and
  * 10n. The r9 measurement showed ×12.3 at ×10 data (per-frame
  * ImageIO reader construction = codec GC pressure at 50k clips);
  * with the per-partition ImageReaderPool the ratio should track the
  * map-only x121 profile (~×8, i.e. sublinear-in-wall from fixed
  * overheads, never superlinear).
  *
  * Usage: runMain graft.tools.CodecDecade [n] (default 5000)
  */
object CodecDecade {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.SparkConfs.kryoGraphConf())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (rows <- Seq(n, 10 * n)) {
      val ids = spark.range(0, rows).select(col("id").as("doc_id"))
        .repartition(cpus)
      val media = graft.ext.Multimodal.synthesizeAvi(
        ids, "doc_id", 16, 12, 4, "png").localCheckpoint()
      media.count() // encode cost excluded: measure the DECODE side
      val t0 = System.nanoTime()
      val cuts = graft.ext.Multimodal.shotBoundaries(
        graft.ext.Multimodal.videoFrameHashes(media)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[codec] clips=$rows%-8d decode+cuts $sec%8.2f s  rows=$cuts")
    }
    spark.stop()
  }
}
