package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Native dot product over two `array<double>` columns — the pair-scan
  * kernel of the similarity operators (q40–q43's cosine, LSH projections,
  * IVF cell scores).
  *
  * Semantics are EXACTLY the sequential left-to-right fold
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,p) -> acc+p)` (and
  * DuckDB's `list_dot_product`): same addition order, bit-identical
  * doubles, so every oracle-checked similarity query stays hash-stable.
  * What changes is the cost model: the higher-order form materializes a
  * |v|-element intermediate array per evaluation — per PAIR in an n² scan
  * — while this kernel reads both inputs in place (`ArrayData.getDouble`)
  * and allocates nothing. doGenCode emits a static call so the expression
  * rides inside whole-stage codegen.
  *
  * Lengths must match (engine invariant: fixed embedding dim); mismatch
  * throws rather than silently truncating. NULL if either side is NULL.
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecDot.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Sequential fold: ((0 + a0·b0) + a1·b1) + … — the parity contract. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** DataFrame-API entry point. */
  def of(a: Column, b: Column): Column =
    ColumnGlue.column(VecDot(ColumnGlue.expression(a), ColumnGlue.expression(b)))
}
