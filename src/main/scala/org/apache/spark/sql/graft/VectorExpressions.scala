package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Codegen'd double-array dot product.
  *
  * Lives under org.apache.spark.sql because AbstractDataType /
  * ExpressionUtils are private[sql] — the standard extension-point
  * placement for custom Catalyst expressions.
  *
  * Why a custom Catalyst Expression (SURVEY.md §2.11 "upgrade path"):
  * Spark's higher-order functions (zip_with/aggregate) are evaluated
  * interpreted — a lambda dispatch plus boxing per element — which made
  * the pairwise-cosine kernels ~50µs/pair. This expression compiles to a
  * tight primitive loop inside whole-stage codegen (~0.1µs for dim-64),
  * keeping the O(candidate-pairs) similarity kernels CPU-bound instead of
  * allocation-bound at corpus scale.
  *
  * Accumulation is sequential in index order in BOTH the interpreted and
  * codegen paths — bit-identical to the DuckDB oracle's list_reduce fold
  * (OracleSql.duckDot). Embedding arrays are dense; element nulls are not
  * expected and read as primitive doubles.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DoubleDot = copy(left = newLeft, right = newRight)
}

/** Codegen'd equal-slot counter over two array<long> columns.
  *
  * The MinHash verify kernel (fraction of agreeing signature slots per
  * candidate pair) was previously `aggregate(zip_with(...))` — an
  * interpreted lambda dispatch plus boxing per slot, the same ~50µs/pair
  * anti-pattern [[DoubleDot]] was built to eliminate in the cosine
  * kernels. This compiles to a primitive loop inside whole-stage codegen;
  * on boilerplate-heavy corpora the candidate-pair count is the hot loop
  * at scale, so the verify stage stays CPU-bound, not allocation-bound.
  *
  * Slots are compared positionally over min(len(a), len(b)); dense arrays,
  * element nulls not expected (signature slots are min-aggregates).
  */
case class LongSlotEq(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) acc += 1; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LongSlotEq = copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column API for [[DoubleDot]]; inputs must be array<double>. */
  def vdot(a: Column, b: Column): Column =
    ExpressionUtils.column(DoubleDot(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  /** Column API for [[LongSlotEq]]; inputs must be array<long>. */
  def vslotEq(a: Column, b: Column): Column =
    ExpressionUtils.column(LongSlotEq(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}
