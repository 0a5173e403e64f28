package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document-fingerprinting / sketching expressions for the dedup operators
  * (SURVEY.md §7 M5 north-star surface). All are deterministic and mirrored
  * exactly by DuckDB oracle SQL (see graft.ops.Dedup), so their outputs are
  * hash-checkable.
  */
object HashFns {
  /** Rolling polynomial fingerprint: h ← (h·31 + charCode) mod 1e9+7. */
  def fingerprint(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  /** 32-bit SimHash over a token array (multiset semantics): bit j is set
    * iff Σ_tokens (2·bit_j(djb2(t)) − 1) > 0. */
  def simhash32(tokens: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(tokens)))

  /** MinHash signature (k permutations) over a shingle array:
    * sig_i = min_s ((2i+1)·djb2(s) + (7919i+13)) mod (2^31 − 1). */
  def minhash(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), k))

  val MinHashP: Long = 2147483647L

  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31L + s.charAt(i).toLong) % 1000000007L; i += 1 }
    h
  }
}

/** Codegen'd scalar: stays inside whole-stage codegen on the scan. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    HashFns.rollingHash(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFns.rollingHash($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** One pass over the token array per row; cheap enough that interpreted
  * evaluation (CodegenFallback) is fine — the surrounding project/filter
  * still codegens.
  */
case class SimHash32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val bal = new Array[Int](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = Djb2.hash(arr.getUTF8String(i).toString)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) bal(j) += 1 else bal(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (bal(j) > 0) out |= (1L << j); j += 1 }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, k: Int) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = Djb2.hash(arr.getUTF8String(i).toString)
      var j = 0
      while (j < k) {
        val v = ((2L * j + 1L) * h + (7919L * j + 13L)) % HashFns.MinHashP
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
