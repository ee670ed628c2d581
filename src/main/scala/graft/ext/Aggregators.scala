package graft.ext

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * The typed-aggregation escape hatch (SURVEY §2.7 UDF/UDAF row): when
 * a reduction genuinely isn't a built-in, `Aggregator[IN, BUF, OUT]`
 * is the Spark-native form — partial/final merge like any hash
 * aggregate (map-side combine, no row-at-a-time SQL UDAF overhead).
 *
 * The demonstrator keeps the engine's determinism contract: an exact
 * java.math.BigDecimal sum + count buffer and ONE double division at
 * `finish`, so the result is bit-identical under any partitioning or
 * merge order — a naive double-accumulating UDAF would drift with the
 * reduce tree. (`avg(cast(decimal))` expresses the same thing
 * built-in; the point here is the extension PATTERN, oracle-checked.)
 */
object Aggregators {

  private val Zero = java.math.BigDecimal.ZERO

  case class MeanBuf(sum: java.math.BigDecimal, n: Long)

  /** Exact mean of a double column: decimal-exact sum, one division. */
  object ExactMean extends Aggregator[Double, MeanBuf, Double] {
    override def zero: MeanBuf = MeanBuf(Zero, 0L)
    override def reduce(b: MeanBuf, a: Double): MeanBuf =
      MeanBuf(b.sum.add(java.math.BigDecimal.valueOf(a)), b.n + 1)
    override def merge(a: MeanBuf, b: MeanBuf): MeanBuf =
      MeanBuf(a.sum.add(b.sum), a.n + b.n)
    override def finish(b: MeanBuf): Double =
      if (b.n == 0) Double.NaN else b.sum.doubleValue() / b.n
    // kryo, NOT Encoders.product: the product encoder would squeeze the
    // BigDecimal through DecimalType(38,18) when partial buffers cross
    // the shuffle — rounding sums needing scale > 18 (breaking the
    // merge-order invariance this aggregator exists for) and decoding
    // |sum| >= 1e20 as null (NPE on the next merge)
    override def bufferEncoder: Encoder[MeanBuf] = Encoders.kryo[MeanBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API form: `df.agg(exactMean(col("x")))`. */
  def exactMean(c: Column): Column = udaf(ExactMean, Encoders.scalaDouble)(c)

  /** Count-Min sketch over a string column — the frequency-sketch
    * member of the "novel sketch" extension family (X1/X2 cousins:
    * MinHash, SimHash, sign-LSH). The buffer is the d×w counter
    * matrix flattened row-major; `merge` is elementwise addition, so
    * the sketch is EXACTLY mergeable: any partitioning, task order, or
    * reduce tree produces the identical matrix (unlike Space-Saving /
    * Misra-Gries summaries, whose merges are order-sensitive).
    * Point estimate = min over rows of cell(r, h_r(x)) — always >= the
    * true count, with the usual CM overestimate bound (spec-pinned).
    *
    * Hash family: the portable md5 bucket (`md5(x + ":" + r)`, first
    * 60 bits, mod w) — the same family as the x18/x26/x27 portable
    * twins, so ANY engine with md5 can rebuild the identical matrix
    * (the corpus query hash-matches the DuckDB re-derivation cell by
    * cell). At 100 TB the sketch is the point: a 4×64 BIGINT matrix
    * summarizes an unbounded token stream in constant memory with
    * map-side partials. */
  class CountMin(val d: Int, val w: Int)
      extends Aggregator[String, Array[Long], Seq[Long]] {
    require(d > 0 && w > 0, "CountMin: d > 0, w > 0")

    private def bucket(x: String, r: Int): Int = {
      // per-thread digest + direct byte extraction: a fresh
      // MessageDigest and a boxed hex round-trip per (token, row) pair
      // is allocation churn on the hot aggregation path. The value is
      // bit-identical to parsing the first 15 hex chars of the digest:
      // bytes 0-6 are the top 56 bits, the high nibble of byte 7 the
      // last 4 — a non-negative 60-bit integer, so % w is safe.
      val md = CountMin.digests.get()
      val dg = md.digest((x + ":" + r).getBytes("UTF-8")) // digest() resets
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (dg(i) & 0xffL); i += 1 }
      v = (v << 4) | ((dg(7) >> 4) & 0xfL)
      (v % w).toInt
    }

    override def zero: Array[Long] = new Array[Long](d * w)
    override def reduce(b: Array[Long], x: String): Array[Long] = {
      var r = 0
      while (r < d) { b(r * w + bucket(x, r)) += 1L; r += 1 }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    // kryo buffer like ExactMean: the counter matrix crosses the
    // shuffle as opaque bytes, no per-element boxing
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

    /** Point estimate from a finished sketch. */
    def estimate(cells: Seq[Long], x: String): Long =
      (0 until d).map(r => cells(r * w + bucket(x, r))).min
  }

  object CountMin {
    private[Aggregators] val digests: ThreadLocal[java.security.MessageDigest] =
      ThreadLocal.withInitial(() =>
        java.security.MessageDigest.getInstance("MD5"))
  }

  /** Column-API form: `df.agg(countMin(4, 64)(col("token")))`. */
  def countMin(d: Int, w: Int)(c: Column): Column =
    udaf(new CountMin(d, w), Encoders.STRING)(c)
}
