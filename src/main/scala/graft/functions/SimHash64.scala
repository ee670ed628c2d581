package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * 64-bit SimHash fingerprint over pre-hashed features
 * (`array<bigint>` of e.g. xxhash64 token hashes): for each bit
 * position the feature hashes vote +1/-1, the sign of the sum sets
 * the fingerprint bit.
 *
 * Same value as the 64-aggregate-HOF formulation this replaces, but
 * ONE pass over the feature array updating 64 counters in a local
 * int[] (the HOF pyramid traverses the array 64 times, interpreted).
 * Empty input yields fingerprint 0 (every vote sum is -0 ... no
 * feature: sum 0, bit cleared since only votes > 0 set bits).
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      // one counter buffer per operator instance, zeroed per row —
      // avoids a 64-int allocation on every input row
      val votes = ctx.addMutableState("int[]", "simhashVotes",
        v => s"$v = new int[64];")
      s"""
         |int $n = $x.numElements();
         |java.util.Arrays.fill($votes, 0);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $x.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) { $votes[$b]++; } else { $votes[$b]--; }
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API entry point: `simhash64(featureHashes)`. */
  def apply(features: Column): Column =
    exprToColumn(SimHash64(columnToExpr(features)))
}
