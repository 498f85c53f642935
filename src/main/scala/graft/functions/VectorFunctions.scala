package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dense-vector kernels as native codegen'd expressions.
  *
  * The HOF spelling (`aggregate(zip_with(a,b,*),0,+)`) runs interpreted
  * — fine for one-off sums, ruinous for an ANN scan doing millions of
  * 64-d dot products. These kernels loop over primitive double arrays
  * inside whole-stage codegen. Accumulation order is ascending-index,
  * identical to the HOF left fold, so results are bit-equal to the
  * declarative spelling. */
object GraftVec {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val x = a.toDoubleArray(); val y = b.toDoubleArray()
    var s = 0.0; var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }
  def cosine(a: ArrayData, b: ArrayData): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** All random-hyperplane sign-bit buckets of `v` in ONE pass: planes
    * is [table][bit][dim]; element t of the result packs that table's
    * sign bits (bit b set iff v·planes(t)(b) >= 0). Equivalent to
    * nTables×bits separate DotProduct-vs-literal columns, but the input
    * vector is unpacked from ArrayData once per row instead of once per
    * plane — the dominant cost at 60k vectors × 32 planes. */
  def hyperplaneSketch(v: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val x = v.toDoubleArray()
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var key = 0L
      var b = 0
      while (b < table.length) {
        val p = table(b)
        var s = 0.0
        var i = 0
        val n = math.min(x.length, p.length)
        while (i < n) { s += x(i) * p(i); i += 1 }
        if (s >= 0) key |= (1L << b)
        b += 1
      }
      out(t) = key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVec.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "graft_cosine"
}

case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftVec.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftVec.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** LSH sketch as a native expression; the plane matrix rides along as a
  * codegen reference object (serialized once per task, not per row). */
case class HyperplaneSketch(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType,
      containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftVec.hyperplaneSketch(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftVec.hyperplaneSketch($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)
  override def prettyName: String = "graft_hyperplane_sketch"
}

/** Elementwise sum of double-array vectors as a typed imperative
  * aggregate. The declarative alternative — posexplode to (row × dim)
  * pairs, avg per (key, pos), re-assemble with collect_list — inflates
  * every row 64× BEFORE the shuffle and then shuffles scalar cells.
  * This aggregate keeps partial sums map-side: what crosses the wire is
  * ONE dim-length array per (group, input partition), making centroid
  * recomputation (k-means/IVF) network cost O(groups × partitions ×
  * dim) instead of O(corpus × dim). Buffer serialization is the raw
  * little-endian double array. */
case class VectorSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Double]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val arr = v.asInstanceOf[ArrayData].toDoubleArray()
      if (buf.isEmpty) arr
      else {
        var i = 0; val n = math.min(buf.length, arr.length)
        while (i < n) { buf(i) += arr(i); i += 1 }
        buf
      }
    }
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      var i = 0; val n = math.min(b1.length, b2.length)
      while (i < n) { b1(i) += b2(i); i += 1 }
      b1
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(offset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_vector_sum"
}

object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def hyperplaneSketch(v: Column, planes: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(HyperplaneSketch(ColumnBridge.expression(v), planes))
  def vectorSum(v: Column): Column =
    ColumnBridge.column(VectorSumAgg(ColumnBridge.expression(v)).toAggregateExpression())
}
