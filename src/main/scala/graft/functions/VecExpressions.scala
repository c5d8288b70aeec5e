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

/** Shared shape of the BIGINT-exact quantized-vector kernels
  * ([[VecDotL]] Σ aᵢ·bᵢ and [[VecSqDistL]] Σ (aᵢ−bᵢ)²): native,
  * codegen'd replacements for the
  * `aggregate(zip_with(a, b, f), 0L, +)` higher-order form, which
  * materializes an intermediate array and interprets two lambdas per
  * element per row — the dominant cost of the within-cell/candidate
  * pair scans (dd8's 2000-vector corpus spent ~2.6 s of a 2.7 s task
  * in it). Semantics replicate the HOF twin EXACTLY so swapping them
  * in cannot change any gate:
  *
  *  - any NULL input array → NULL (BinaryExpression's null handling);
  *  - a NULL element → NULL result (zip_with's lambda yields NULL,
  *    `acc + NULL` poisons the aggregate — NOT skip-as-zero);
  *  - length mismatch → NULL result (zip_with pads the shorter side
  *    with NULLs);
  *  - arithmetic is checked 64-bit (`Math.*Exact`), matching the ANSI
  *    error-on-overflow behavior of the built-in operators — all
  *    callers sit behind the qnBound guards that make overflow
  *    unreachable, so this is belt-and-braces, not a live path.
  */
abstract class VecLongKernel extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null elements / length mismatch

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs two bigint[] args, got ${left.dataType} / ${right.dataType}")
    }

  /** Checked per-element contribution. */
  protected def term(x: Long, y: Long): Long
  /** Java source of the contribution, as f(x, y). */
  protected def termCode(x: String, y: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s = Math.addExact(s, term(a.getLong(i), b.getLong(i)))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc = java.lang.Math.addExact($acc,
         |      ${termCode(s"$a.getLong($i)", s"$b.getLong($i)")});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }
}

/** Σ aᵢ·bᵢ over two array<bigint> columns — BIGINT-exact dot product. */
case class VecDotL(left: Expression, right: Expression) extends VecLongKernel {
  override def prettyName: String = "vec_dot_l"
  override protected def term(x: Long, y: Long): Long = Math.multiplyExact(x, y)
  override protected def termCode(x: String, y: String): String =
    s"java.lang.Math.multiplyExact($x, $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two array<bigint> columns — BIGINT-exact squared
  * euclidean distance (the k-means/IVF kernel). */
case class VecSqDistL(left: Expression, right: Expression) extends VecLongKernel {
  override def prettyName: String = "vec_sqdist_l"
  override protected def term(x: Long, y: Long): Long = {
    val d = Math.subtractExact(x, y)
    Math.multiplyExact(d, d)
  }
  override protected def termCode(x: String, y: String): String =
    s"java.lang.Math.multiplyExact(java.lang.Math.subtractExact($x, $y), " +
      s"java.lang.Math.subtractExact($x, $y))"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecExpressions {
  /** Register the native vector kernels in a session's function
    * registry (idempotent): vec_dot (float/double), and the
    * BIGINT-exact vec_dot_l / vec_sqdist_l quantized twins. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_l", exprs => VecDotL(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_sqdist_l", exprs => VecSqDistL(exprs(0), exprs(1)), "built-in")
  }
}
