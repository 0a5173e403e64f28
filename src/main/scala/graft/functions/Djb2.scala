package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** djb2 string hash with JavaScript arithmetic semantics.
  *
  * Re-implements the reference partitioner's hash function
  * (reference partitioner/index.js:17–23):
  * {{{
  *   let h = 5381;
  *   for (i) h = ((h << 5) + h) + str.charCodeAt(i);
  *   return Math.abs(h);
  * }}}
  * In JS, `h << 5` coerces `h` through ToInt32 (wrap to signed 32-bit) and
  * the shift itself wraps, but the subsequent `+ h + c` additions happen in
  * double arithmetic and are NOT wrapped, so `h` grows beyond 32 bits
  * between iterations. Doubles are exact for |h| < 2^53, which holds for
  * strings up to ~4M chars; a Scala `Long` reproduces the value exactly
  * (`h.toInt` == ToInt32). Spark's built-in `hash()`/`xxhash64` are NOT
  * bit-compatible, and partition routing must match the reference, hence
  * this custom expression (with codegen, so it stays inside
  * whole-stage-codegen spans on the 100 TB ingest path).
  */
object Djb2 {
  /** The fold BEFORE the final abs — exposed so derived hashes (e.g.
    * SimHash64's second view, hash(t ⧺ "#")) can extend an existing fold
    * by one step instead of re-hashing every character. */
  def raw(s: String): Long = {
    var h = 5381L
    var i = 0
    val n = s.length
    while (i < n) {
      h = ((h.toInt << 5).toLong) + h + s.charAt(i).toLong
      i += 1
    }
    h
  }

  /** One fold step: the state after consuming `c` from state `h`. */
  @inline def step(h: Long, c: Char): Long =
    ((h.toInt << 5).toLong) + h + c.toLong

  def hash(s: String): Long = math.abs(raw(s))

  /** Column API: `djb2($"key")` → LongType. */
  def djb2(c: Column): Column =
    ColumnBridge.column(Djb2Hash(ColumnBridge.expression(c)))
}

case class Djb2Hash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "djb2"

  override protected def nullSafeEval(input: Any): Any =
    Djb2.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Djb2.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Djb2Hash =
    copy(child = newChild)
}
