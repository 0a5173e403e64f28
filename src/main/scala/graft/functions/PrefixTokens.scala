package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The first `n` whitespace tokens of a document, joined — or NULL when
  * the document has fewer than `n` tokens. Semantically identical to
  * `array_join(slice(split(text, " "), 1, n), " ")` behind a
  * `size(split(...)) >= n` guard, but computed as a single O(prefix)
  * character scan: no token array is materialized and the document body
  * past the n-th space is never touched. For the q144 prefix-cache audit
  * that turns an O(doc)-per-row allocation (split the whole document to
  * read 8 tokens) into a bounded scan of ≤ the prefix itself — the
  * difference between "tokenize 100 TB" and "read the first line of
  * 100 TB".
  *
  * Equivalence note (why the oracle is unchanged): `split` on a single
  * space preserves consecutive separators as empty tokens, and joining
  * the first n of them with a single space reproduces the original
  * character sequence up to the n-th space EXACTLY — so "text truncated
  * before its n-th space" is the same string, including any repeated
  * spaces inside the prefix.
  */
object PrefixTokensFn {
  /** Static body shared by interpreted eval and generated code. Returns
    * null when the text holds fewer than n tokens. Operates directly on
    * the UTF8String bytes — a space is the single byte 0x20 in UTF-8 and
    * cannot occur inside a multi-byte sequence, so no decoding is needed;
    * the only allocation is the returned prefix itself. */
  def prefixTokens(s: UTF8String, n: Int): UTF8String = {
    val nBytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var spaces = 0
    var i = 0
    while (i < nBytes) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) {
        spaces += 1
        // the n-th space ends the n-token prefix: copy ONLY those bytes
        // (the source may live in a reused unsafe-row buffer, so the
        // result must own its memory)
        if (spaces == n) {
          val out = new Array[Byte](i)
          org.apache.spark.unsafe.Platform.copyMemory(
            base, off, out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, i)
          return UTF8String.fromBytes(out)
        }
      }
      i += 1
    }
    // no n-th space: the text has spaces+1 tokens — exactly n keeps all.
    // Copy here too: the other branch copies because the source may live
    // in a reused unsafe-row buffer, and that hazard is identical for a
    // whole-string result (review r11 — the two branches must agree)
    if (spaces + 1 >= n) {
      val out = new Array[Byte](nBytes)
      org.apache.spark.unsafe.Platform.copyMemory(
        base, off, out, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        nBytes)
      UTF8String.fromBytes(out)
    } else null
  }

  /** Column API: `prefixTokens($"text", 8)` → StringType (nullable). */
  def prefixTokens(text: Column, n: Int): Column =
    ColumnBridge.column(PrefixTokens(ColumnBridge.expression(text), n))
}

case class PrefixTokens(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"prefix_tokens needs n >= 1, got $n")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "prefix_tokens"

  override protected def nullSafeEval(input: Any): Any =
    PrefixTokensFn.prefixTokens(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PrefixTokensFn.prefixTokens($c, $n);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): PrefixTokens =
    copy(child = newChild)
}
