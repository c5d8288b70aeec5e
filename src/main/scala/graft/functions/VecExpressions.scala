package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot-product over two numeric-array columns.
  *
  * The higher-order-function form (`aggregate(zip_with(a,b,*),...)`)
  * materializes an intermediate array and evaluates a lambda per
  * element per row — at N² near-dup scale that dominated the runtime
  * (~177 s for 2M pairs at sf0.1). This expression runs a primitive
  * fused multiply-add loop directly over the columnar ArrayData (float
  * or double elements, accumulating in double, left-to-right), with
  * codegen emitting the same loop inline so the surrounding
  * whole-stage-codegen span stays unbroken.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs two float[] or two double[] args, got ${left.dataType} / ${right.dataType}")
    }
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Null ELEMENTS contribute 0 — checked explicitly in both paths:
  // without the guard, unsafe rows silently read garbage 0s while
  // interpreted rows NPE on unboxing, i.e. the same query's behavior
  // would depend on whether codegen kicked in.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    if (isFloat) while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    } else while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      // acc MUST be fresh: cosine() expands to three vec_dots in one
      // projection — a fixed name redeclares, janino fails, and the
      // whole stage silently drops to interpreted execution
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.$getter($i) * (double) $b.$getter($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  /** Register vec_dot in a session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
}
