package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins over event tables (SURVEY §2.7 "range/as-of"
 * extension row — the reference is batch-only and has no join
 * surface; these are the event-pipeline operators a training-data
 * engine needs, per BASELINE.json's north star).
 *
 * Both operators avoid the naive inequality join (which Spark can
 * only execute as a broadcast-nested-loop — quadratic row explosion):
 *
 *  - [[asofJoin]] is the union-tag formulation: ONE shuffle on the
 *    key, one within-partition sort, then a running `last(_, ignore
 *    nulls)` window — O((|L|+|R|) log) per partition, the canonical
 *    scalable as-of (same plan shape Flink/Kafka temporal joins
 *    lower to).
 *  - [[intervalJoin]] bucketizes time so candidates meet in an
 *    EQUI-join on (key, bucket) and the range predicate is a cheap
 *    post-filter — shuffle volume is bounded by bucket fan-out
 *    (ceil(window/bucket)+1 copies of the probe side), never |L|×|R|.
 */
object TemporalJoins {

  /** For every left row, attach the latest right row with
    * `right.ts <= left.ts` on the same key (DuckDB/pandas ASOF-join
    * semantics, inclusive). Right payload columns arrive prefixed;
    * unmatched left rows keep them null.
    *
    * Right rows should be unique per (key, ts) — with duplicates the
    * winner among equal timestamps is unspecified (same caveat as
    * DuckDB ASOF JOIN); pre-dedup with a `row_number` qualify when
    * determinism matters. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               rightPayload: Seq[String], prefix: String = "right_"): DataFrame =
    asofJoinKeys(left, right, Seq(key), tsCol, rightPayload, prefix)

  /** [[asofJoin]] generalized to a COMPOSITE key — the same
    * union-tag/running-last kernel partitioned by `keys`. The extra
    * key columns are the hot-key valve: partitioning an attribution
    * as-of by (user, time-bucket) instead of bare user bounds each
    * sort partition by per-bucket activity rather than a skewed
    * user's full lifetime (r11 verdict's named scale-killer). */
  def asofJoinKeys(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, rightPayload: Seq[String],
                   prefix: String = "right_"): DataFrame = {
    require(keys.nonEmpty, "asofJoinKeys: keys must be non-empty")
    val leftPayload =
      left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val rp = (rightPayload :+ tsCol).distinct // matched ts rides along
    // The right payload travels as ONE struct so the running last()
    // carries whole rows atomically — per-column last(ignoreNulls)
    // would tear rows, backfilling a null payload field from an OLDER
    // right row.
    val rStructT = org.apache.spark.sql.types.StructType(
      rp.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lSide = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__side")) ++
        leftPayload.map(col) :+
        lit(null).cast(rStructT).as("__r"): _*)
    val rSide = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rp.map(col): _*).as("__r"): _*)
    // right rows sort BEFORE left rows at equal ts => inclusive match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rSide.unionByName(lSide)
      .select(
        keys.map(col) ++ Seq(col(tsCol), col("__side")) ++
          leftPayload.map(col) :+
          last(col("__r"), ignoreNulls = true).over(w).as("__r"): _*)
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++ Seq(col(tsCol)) ++ leftPayload.map(col) ++
          rp.map(c => col(s"__r.$c").as(prefix + c)): _*)
  }

  /** Equi-key interval join: pairs (l, r) with the same key and
    * `r.ts ∈ [l.ts - lookback, l.ts]`. `bucket` must be >= `lookback`
    * sized so each left row probes at most two buckets; both are
    * millisecond durations. Returns left columns + prefixed right
    * payload, one row per matching pair (inner semantics). */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   tsCol: String, rightPayload: Seq[String],
                   lookbackMs: Long, prefix: String = "right_"): DataFrame = {
    require(lookbackMs > 0, "intervalJoin: lookbackMs must be positive")
    val bucketMs = lookbackMs // one lookback per bucket => probe spans <= 2
    def bucketOf(ts: Column): Column =
      floor(unix_millis(ts) / lit(bucketMs)).cast("long")
    // probe side explodes into the (at most two) buckets its window
    // overlaps; build side lands in exactly one bucket
    val probe = left.withColumn("__bucket",
      explode(array_distinct(array(
        bucketOf(col(tsCol) - expr(s"INTERVAL $lookbackMs MILLISECONDS")),
        bucketOf(col(tsCol))))))
    val build = right.select(
      Seq(col(key), bucketOf(col(tsCol)).as("__bucket")) ++
        (rightPayload :+ tsCol).distinct.map(c => col(c).as(prefix + c)): _*)
    probe.join(build, Seq(key, "__bucket"))
      .filter(col(prefix + tsCol) >= col(tsCol) - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
        col(prefix + tsCol) <= col(tsCol))
      .drop("__bucket")
  }
}
