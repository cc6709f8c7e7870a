package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two numeric-array columns.
  *
  * The composable formulation (`zip_with` to multiply + `aggregate` to
  * sum, three times for dot/|a|²/|b|²) is codegen-friendly but allocates
  * an intermediate array per pair and walks both inputs three times —
  * measurable on the O(n²)/O(bucket²) similarity joins (SparkEntry
  * q18/q19, ANN). This expression computes dot, |a|² and |b|² in ONE
  * fused loop over the two `ArrayData`, no allocation, inside
  * whole-stage codegen (`doGenCode`), with an interpreted `nullSafeEval`
  * twin for completeness.
  *
  * Semantics are bit-identical to the HOF formulation (same
  * element-order double accumulation; CosineSimSpec asserts exact
  * equality):
  *   - null input array, length mismatch, or null element → null
  *     (zip_with pads/propagates nulls → the aggregate sum goes null);
  *   - zero-norm vectors → null. NOT NaN: Spark orders NaN greater than
  *     every double, so a 0/0 NaN would rank FIRST in every descending
  *     top-k and pass every `>= threshold` filter — a zero embedding
  *     would silently become everyone's nearest neighbor. Null drops
  *     out of filters and sorts last. (The HOF twin under ANSI throws
  *     DIVIDE_BY_ZERO instead — the one documented divergence.)
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_sim needs two array<float> or two array<double> columns, got ${l.sql} / ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val isFloat = elemType == FloatType
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val q = if (isFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += p * q; na += p * p; nb += q * q
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / math.sqrt(na * nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $p = (double) $a.$getter($i);
         |    final double $q = (double) $b.$getter($i);
         |    $dot += $p * $q; $na += $p * $p; $nb += $q * $q;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |    }
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-API entry point: `cosineSim($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
