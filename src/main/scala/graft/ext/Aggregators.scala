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
}
