package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Jaccard similarity |a ∩ b| / |a ∪ b| over two SORTED, DISTINCT
 * `array<bigint>` columns (hashed shingle sets) as one fused merge
 * loop — no per-row hash-set allocation, codegen'd.
 *
 * The HOF formulation (`size(array_intersect)/size(array_union)`)
 * builds two hash sets per candidate pair; on a dedup sweep the pair
 * count is O(block²), so allocation dominates and GC pressure makes
 * timings bimodal. A merge over pre-sorted arrays is O(|a|+|b|) with
 * zero allocation — the kernel shape a 100 TB near-dup sweep needs
 * (reference scope: dedup is a BASELINE.json north-star extension,
 * not in saezlab/onionnet itself).
 *
 * Inputs MUST be sorted ascending and duplicate-free (produced by
 * [[graft.ext.Dedup.hashedShingles]]); behavior on unsorted input is
 * unspecified. Empty ∪ empty returns NULL, NOT NaN: Spark's nan-safe
 * ordering treats NaN as GREATER than every number (SPARK-8280), so a
 * NaN would sail through `>= threshold` filters and emit spurious
 * pairs; NULL comparisons are null → filtered, matching the DuckDB
 * oracle's 0/0 → NULL.
 */
case class SortedArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard expects two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    if (nx == 0 && ny == 0) return null
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements(); int $ny = $y.numElements();
         |if ($nx == 0 && $ny == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = 0; int $j = 0; int $inter = 0;
         |  while ($i < $nx && $j < $ny) {
         |    long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |    if ($xv == $yv) { $inter++; $i++; $j++; }
         |    else if ($xv < $yv) { $i++; } else { $j++; }
         |  }
         |  ${ev.value} = (double) $inter / (double) ($nx + $ny - $inter);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedArrayJaccard {
  /** Column-API entry point: `sorted_jaccard(a, b)`. */
  def apply(a: Column, b: Column): Column =
    exprToColumn(SortedArrayJaccard(columnToExpr(a), columnToExpr(b)))
}
