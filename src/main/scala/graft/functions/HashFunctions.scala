package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels, callable from generated Java (standalone Scala
  * objects emit static forwarders). */
object GraftHash {

  /** FNV-1a 64-bit over the UTF-8 bytes. Self-contained (no engine
    * internals), stable across versions — fingerprints written at one
    * engine version stay joinable at the next. */
  def hash64(s: UTF8String): Long = {
    val b = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** 64-bit SimHash of a token array: per-bit vote of each token's
    * hash, sign of the vote becomes the bit. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Karp-Rabin rolling hashes of all byte k-grams (wrapping mod 2^64):
    * O(len) total — each window reuses the previous hash instead of
    * rehashing k bytes. The document-fingerprinting primitive. */
  def rollingHashes(s: UTF8String, k: Int): ArrayData = {
    val b = s.getBytes
    if (b.length < k) return new GenericArrayData(Array.empty[Long])
    val B = 1000003L
    var bk = 1L // B^(k-1)
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    val out = new Array[Long](b.length - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (b(i) & 0xffL); i += 1 }
    out(0) = h
    i = k
    while (i < b.length) {
      h = (h - (b(i - k) & 0xffL) * bk) * B + (b(i) & 0xffL)
      out(i - k + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** SimHash as a native Catalyst expression: participates in whole-stage
  * codegen via a static kernel call — no UDF serialization, no boxing
  * of the token array beyond Catalyst's own ArrayData. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    GraftHash.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash64"
}

/** All k-gram Karp-Rabin rolling hashes of a string as array<long>. */
case class RollingHashes(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    GraftHash.rollingHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.rollingHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_rolling_hashes"
}

object HashFunctions {
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def rollingHashes(text: Column, k: Int): Column =
    ColumnBridge.column(RollingHashes(ColumnBridge.expression(text), k))

  /** Register for SQL use: graft_simhash64(arr), graft_rolling_hashes(s). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_rolling_hashes",
      exprs => RollingHashes(exprs.head, 8), "built-in")
  }
}
