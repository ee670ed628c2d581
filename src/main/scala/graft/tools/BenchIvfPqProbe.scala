package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the persisted IVF-PQ probe economics (x137 / SCALE.md):
  * probe cost must stay FLAT as the corpus grows ×10 (at fixed cell
  * size the probe reads nProbe directories regardless of corpus
  * size), where the r10 in-memory shape (x135: corpus-wide
  * codes⋈assign shuffle before the cell filter) grows with the
  * corpus.
  *
  * The layout is SYNTHESIZED directly in writeIvfPq's exact shape
  * (codes-with-cell partitioned by cell + centroids + codebook) so
  * the measurement isolates the SERVING path — training cost is the
  * build-time lever and is measured separately by the kmeans decade
  * rows. Both legs score the same ADC arithmetic over the same
  * tables; only the plan shape differs.
  *
  * Usage: runMain graft.tools.BenchIvfPqProbe [n] [factor]
  *   n = base corpus vectors (default 500000), factor ×10 second leg.
  */
object BenchIvfPqProbe {
  def main(args: Array[String]): Unit = {
    val nBase = args.headOption.map(_.toLong).getOrElse(500000L)
    val factor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val cpus = Runtime.getRuntime.availableProcessors
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dims = 16; val m = 4; val k = 8; val cellSize = 5000L
    val sub = dims / m
    val nProbe = 8

    def synthLayout(n: Long, path: String): Int = {
      val cells = math.max(1L, n / cellSize).toInt
      // codes in writeIvfPq's exact output shape: cell partition dirs
      spark.range(0, n).select(col("id").as("vec_id"),
          explode(sequence(lit(0), lit(m - 1))).as("subspace"))
        .select(col("vec_id"), col("subspace"),
          pmod(col("vec_id") * 7 + col("subspace"), lit(k)).cast("int")
            .as("code"),
          (pmod(col("vec_id"), lit(cells.toLong)) + 1).cast("int").as("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
      // unpartitioned twin + assignment table = the r10 in-memory shape
      spark.read.parquet(s"$path/codes")
        .select("vec_id", "subspace", "code")
        .write.mode("overwrite").parquet(s"$path/codes_flat")
      spark.range(0, n).select(col("id").as("vec_id"),
          (pmod(col("id"), lit(cells.toLong)) + 1).cast("int").as("cluster"))
        .write.mode("overwrite").parquet(s"$path/assign")
      (1 to cells).flatMap(c => (0 until dims).map(d =>
          (c, d, ((c * 31 + d * 17) % 2000 - 1000).toLong)))
        .toDF("cluster", "dim", "cq")
        .write.mode("overwrite").parquet(s"$path/centroids")
      (0 until m).flatMap(s => (1 to k).flatMap(cl => (0 until sub).map(d =>
          (s, cl, d, ((s * 13 + cl * 7 + d) % 500 - 250).toLong))))
        .toDF("subspace", "cluster", "dim", "cq")
        .write.mode("overwrite").parquet(s"$path/codebook")
      cells
    }

    val queries = (0 until 16).map(i =>
        (1000000000L + i, Array.tabulate(dims)(d =>
          ((i * 31 + d * 7) % 1000 / 1000.0).toFloat)))
      .toDF("vec_id", "embedding").localCheckpoint()

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      System.err.println(f"[ivfpq] $name%-28s " +
        f"${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }

    /** The r10 in-memory shape: corpus-wide codes⋈assign on vec_id,
      * THEN the broadcast probe filter (x135's weak plan). */
    def oldShape(path: String, probes: DataFrame, lut: DataFrame): Long = {
      import org.apache.spark.sql.expressions.Window
      val scored = spark.read.parquet(s"$path/codes_flat")
        .join(spark.read.parquet(s"$path/assign")
          .select(col("vec_id"), col("cluster").as("cell")), Seq("vec_id"))
        .join(broadcast(probes), Seq("cell"))
        .join(broadcast(lut), Seq("query_id", "subspace", "code"))
        .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
        .agg(sum("adist").as("adc_d2"))
      val top = graft.plans.TopKPerGroup(scored, Seq("query_id"),
        Seq(("adc_d2", true), ("neighbor_id", true)), 10)
      val w = Window.partitionBy("query_id")
        .orderBy(col("adc_d2"), col("neighbor_id"))
      top.withColumn("rank", row_number().over(w)).count()
    }

    for (leg <- Seq(("base", nBase), (s"x$factor", nBase * factor))) {
      val (tag, n) = leg
      val path = java.nio.file.Files
        .createTempDirectory(s"ivfpq_$tag").toString
      timed(s"build_layout_$tag($n)") { synthLayout(n, path); n }
      // shared probe prep (queries × cells ranking + LUT — query-sized)
      import org.apache.spark.sql.expressions.Window
      val cents = spark.read.parquet(s"$path/centroids")
      val qfull = graft.ext.Clustering.quantize(queries)
        .select(col("vec_id").as("query_id"), col("dim"), col("q"))
        .localCheckpoint()
      val wp = Window.partitionBy("query_id").orderBy(col("d2"), col("cluster"))
      val probes = qfull.join(broadcast(cents), Seq("dim"))
        .groupBy("query_id", "cluster")
        .agg(sum(((col("q") - col("cq")) * (col("q") - col("cq")))
          .cast("decimal(38,0)")).as("d2"))
        .withColumn("rk", row_number().over(wp)).filter(col("rk") <= nProbe)
        .select(col("query_id"), col("cluster").as("cell"))
        .localCheckpoint()
      val codebook = spark.read.parquet(s"$path/codebook")
      val qq = (0 until m).map { s =>
        qfull.filter(col("dim") >= s * sub && col("dim") < (s + 1) * sub)
          .select(col("query_id"), lit(s).as("subspace"),
            (col("dim") - s * sub).as("dim"), col("q"))
      }.reduce(_ unionAll _)
      val lut = qq.join(broadcast(codebook), Seq("subspace", "dim"))
        .groupBy("query_id", "subspace", "cluster")
        .agg(sum(((col("q") - col("cq")) * (col("q") - col("cq")))
          .cast("decimal(38,0)")).cast("long").as("adist"))
        .withColumnRenamed("cluster", "code").localCheckpoint()
      timed(s"probe_pruned_$tag") {
        val probedCells = probes.select("cell").distinct()
          .collect().map(_.getInt(0))
        val codes = spark.read.parquet(s"$path/codes")
          .where(col("cell").isin(probedCells.map(Integer.valueOf): _*))
        val scored = codes.join(broadcast(probes), Seq("cell"))
          .join(broadcast(lut), Seq("query_id", "subspace", "code"))
          .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
          .agg(sum("adist").as("adc_d2"))
        val top = graft.plans.TopKPerGroup(scored, Seq("query_id"),
          Seq(("adc_d2", true), ("neighbor_id", true)), 10)
        val w = Window.partitionBy("query_id")
          .orderBy(col("adc_d2"), col("neighbor_id"))
        top.withColumn("rank", row_number().over(w)).count()
      }
      timed(s"probe_oldshape_$tag") { oldShape(path, probes, lut) }
    }
    spark.stop()
  }
}
