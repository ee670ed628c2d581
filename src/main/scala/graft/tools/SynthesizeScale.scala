package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic scale synthesizer: replicate an sf directory `factor`×
 * with FK-preserving key-space remapping, so the bench can be measured
 * a decade above the largest driver-generated scale (SCALE.md).
 *
 * Every fact/bridge key family gets a decimal STRIDE (the smallest
 * power of 10 above its max key, computed from the source data — no
 * RNG, no config): replica r adds `r * stride` to every column of the
 * family, so
 *   - keys never collide across replicas,
 *   - every FK edge (orders→customer, lineitem→orders/part/supplier,
 *     events→user) lands on the same replica's parent — the graph
 *     becomes `factor` disjoint copies glued to the SHARED dimension
 *     tables (region/nation are copied as-is, like real reference
 *     data),
 *   - the mapping is invertible (original key = new MOD stride).
 *
 * Text/embedding payloads are replicated VERBATIM by default: a 10×
 * corpus where every document has 10 exact copies is a deliberate
 * dedup/ANN stress (the clusters the pipeline exists to find), not an
 * artifact. `--mutate ppm` switches documents to a REALISTIC near-dup
 * profile instead: replica r>0 substitutes each token with
 * probability ppm/1e6, deterministically keyed on (replica, doc, pos)
 * — so replicas of a doc sit at ~(1-3q)-Jaccard over 3-shingles
 * (ppm=20000 → ~0.9), the web-crawl regime, rather than jaccard 1.0's
 * worst-case pair explosion. Replica 0 stays verbatim (the original
 * corpus is a subset of the scaled one in both modes).
 *
 * Usage: runMain graft.tools.SynthesizeScale <inDir> <outDir> [factor]
 *          [--mutate ppm]
 */
object SynthesizeScale {

  /** Smallest power of 10 strictly above the column's max (≥ 10). */
  private def stride(df: DataFrame, col0: String): Long = {
    val mx = df.agg(max(col(col0))).head().getLong(0)
    var s = 10L
    while (s <= mx) s *= 10
    s
  }

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val mi = args.indexOf("--mutate")
    val mutatePpm = if (mi == -1) 0 else args(mi + 1).toInt
    val pos = args.zipWithIndex.drop(2)
      .filterNot { case (a, i) => a.startsWith("--") || i == mi + 1 }
      .map(_._1)
    val factor = pos.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String) = spark.read.parquet(s"$in/$name.parquet")

    // one stride per key family, computed from the OWNING table
    val custS = stride(t("customer"), "c_custkey")
    val suppS = stride(t("supplier"), "s_suppkey")
    val partS = stride(t("part"), "p_partkey")
    val ordS = stride(t("orders"), "o_orderkey")
    val evS = stride(t("events"), "event_id")
    val userS = stride(t("events"), "user_id")
    val docS = stride(t("documents"), "doc_id")
    val vecS = stride(t("embeddings"), "vec_id")

    val reps = spark.range(factor).select(col("id").as("rep"))
    // cross-join each table with the replica ids and shift the listed
    // key columns by rep*stride; everything else passes through
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame =
      replicate2(df, shifts: _*)(identity)
    // variant exposing the replica id to a payload transform (the
    // mutate mode) BEFORE key shifting drops it
    def replicate2(df: DataFrame, shifts: (String, Long)*)
                  (payload: DataFrame => DataFrame): DataFrame = {
      val shifted = payload(df.crossJoin(broadcast(reps)))
      shifts.foldLeft(shifted) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + col("rep") * s)
      }.drop("rep")
    }
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[synth] $name -> ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // shared dimensions: verbatim copies
    write(t("region"), "region")
    write(t("nation"), "nation")
    write(replicate(t("customer"), "c_custkey" -> custS), "customer")
    write(replicate(t("supplier"), "s_suppkey" -> suppS), "supplier")
    write(replicate(t("part"), "p_partkey" -> partS), "part")
    write(replicate(t("orders"),
      "o_orderkey" -> ordS, "o_custkey" -> custS), "orders")
    write(replicate(t("lineitem"), "l_orderkey" -> ordS,
      "l_partkey" -> partS, "l_suppkey" -> suppS), "lineitem")
    write(replicate(t("events"),
      "event_id" -> evS, "user_id" -> userS), "events")
    val docsRep = replicate2(t("documents"), "doc_id" -> docS) { d =>
      if (mutatePpm == 0) d
      else d.withColumn("text", when(col("rep") === 0, col("text"))
        .otherwise(array_join(transform(split(col("text"), " "),
          (x, i) => when(
            pmod(xxhash64(col("rep"), col("doc_id"), i), lit(1000000L))
              < mutatePpm,
            concat(lit("mut"),
              pmod(xxhash64(lit("sub"), col("rep"), col("doc_id"), i),
                lit(997L)))).otherwise(x)), " ")))
    }
    write(docsRep, "documents")
    write(replicate(t("embeddings"), "vec_id" -> vecS), "embeddings")

    // FK sanity: a dangling orders→customer or lineitem→orders edge
    // means a stride bug — fail loudly, not with a silently thinner
    // graph at the other end
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val danglingCust = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count()
    val danglingOrd = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti").count()
    require(danglingCust == 0 && danglingOrd == 0,
      s"FK remap broke: $danglingCust dangling orders, $danglingOrd dangling lineitems")
    System.err.println(s"[synth] FK check clean; factor=$factor in=$in out=$out")
    spark.stop()
  }
}
