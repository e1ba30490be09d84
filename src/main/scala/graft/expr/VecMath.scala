package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `array<float>` columns.
  *
  * The only place round 1 promotes a built-in composition to a custom
  * Catalyst `Expression` (SURVEY §7.3's escalation rule: "only if benchmarks
  * demand"): the higher-order-function formulation
  * `aggregate(zip_with(a, b, *), 0d, +)` runs interpreted per element
  * (~3 µs/elem) and dominated similarity queries (~200k pairs × 64 dims at
  * sf0.1). This expression emits a tight fused loop inside whole-stage
  * codegen.
  *
  * Semantics are BIT-IDENTICAL to the fold it replaces (same left-to-right
  * double accumulation of float-to-double products), so the DuckDB oracle
  * (`Similarity.sqlDot`, a `list_reduce` left fold) is unchanged —
  * `VecMathSpec` asserts expression == fold on random vectors.
  */
case class FloatVectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // NULL on length mismatch or any null element — exactly what the fold
  // produces (zip_with null-pads the shorter side; null propagates through
  // * and +), and what the DuckDB list_zip mirror returns. Malformed
  // embeddings therefore surface as NULL, never a silently-truncated dot.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecMath {
  import org.apache.spark.sql.graft.ColumnBridge
  def floatDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatVectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
