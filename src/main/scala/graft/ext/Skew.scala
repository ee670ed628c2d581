package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted join for heavy-hitter keys (SURVEY §7.4: 5 regions vs
 * millions of facts). AQE's skew-join split handles sort-merge skew at
 * runtime; explicit salting is the deterministic fallback when a
 * single key's rows exceed one executor's memory in a shuffled hash
 * join or aggregation.
 *
 * The big side gets a deterministic per-row salt (hash of the whole
 * row modulo `salts` — no rand(), so retries/speculative tasks agree);
 * the small side is replicated across all salt values.
 */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, fanning the small side out
    * `salts` ways so the big side's heavy keys spread across tasks.
    *
    * Only big-side-preserving join types are accepted: replicating the
    * small side means right/full-outer would emit `salts` copies of
    * each unmatched small-side row. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched " +
        s"small-side rows across $salts salts; use one of $allowed")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on
    * (key, salt), then final merge on key. `partial` and `merge` name
    * the same-shaped aggregate columns (e.g. sum -> sum). */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int = 8): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol).cast("decimal(38,6)")).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").cast("double").as(s"sum_$valueCol"))

  /** Bit position `j` of the portable Bloom family: the md5-60-bit
    * integer of `"j:key"` mod `m`. Deterministic and engine-
    * re-derivable (the repo's md5 hash-family convention), unlike
    * Spark's built-in runtime bloom (xxhash-based, opaque bits). */
  private def bloomPos(key: Column, j: Int, m: Int): Column =
    pmod(conv(substring(md5(
      concat_ws(":", lit(j), key.cast("string"))), 1, 15), 16, 10)
      .cast("long"), lit(m.toLong))

  /** Build the portable Bloom filter of a (small) key set as the
    * DISTINCT set-bit positions — at most `|keys|·h` rows out of `m`
    * bits, broadcastable by construction. Semantically identical to a
    * bitmap; the set-of-positions form is what lets an external
    * engine re-derive it row for row. */
  def bloomBits(keys: DataFrame, keyCol: String, m: Int = 4096,
                h: Int = 2): DataFrame = {
    require(h >= 1 && m >= 2, s"bloomBits: need h >= 1, m >= 2 (got $h, $m)")
    keys.select(explode(array((0 until h).map(j =>
        bloomPos(col(keyCol), j, m)): _*)).as("bit"))
      .distinct()
  }

  /** Pre-filter the BIG side of a prospective join by the small
    * side's Bloom bits BEFORE any exchange: one broadcast left-semi
    * join per hash function (h is 1-3 — each is map-side, the fact
    * table never shuffles), keeping exactly the rows whose h
    * positions are all set. No false negatives by construction —
    * every true match survives; false positives (fp rate ~
    * (set_bits/m)^h) are culled by the real join afterwards. The
    * 100 TB shape: the exchange the REAL join pays afterwards moves
    * only ~selectivity·fact rows instead of the whole table. */
  def bloomPrefilter(fact: DataFrame, keyCol: String, bits: DataFrame,
                     m: Int = 4096, h: Int = 2): DataFrame =
    (0 until h).foldLeft(fact) { (df, j) =>
      df.join(broadcast(bits.select(col("bit").as(s"__b$j"))),
        bloomPos(col(keyCol), j, m) === col(s"__b$j"), "left_semi")
    }
}
