package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Map-side scalar quantizer (SQ8): every dimension of the child vector is
  * independently quantized to an 8-bit code against per-dim corpus
  * `[min, max]` bounds — `code_d = clamp(⌊(x_d − min_d) / range_d · 255⌋,
  * 0, 255)`, with constant dims (`range_d = 0`) pinned to code 0. Returns
  * the 64 positional codes as `array<long>`.
  *
  * This is the third compression point on the index shelf: PQ (q73) trades
  * accuracy for 64× compression via trained codebooks; SQ8 is the
  * training-free 4× path (one byte per dim instead of a float) that most
  * production vector stores (FAISS `SQ8`, Lucene/Elasticsearch
  * `int8_hnsw`) reach for first, because its per-dim bounds are two exact
  * streaming aggregates — no clustering pass over 100 TB.
  *
  * Bounds are bounded driver metadata (2 × 64 doubles — the same class as
  * [[NearestCells]]' centroid matrix), baked into the expression, so the
  * corpus is encoded in a single codegen'd projection over the scan with
  * ZERO exchange.
  *
  * Arithmetic is bit-compatible with the DuckDB oracle: the quantization
  * transform is `((x − min) / range) · 255.0` — division before the
  * multiply, both IEEE-exact in any engine — and `⌊·⌋` on a non-negative
  * double is exact in both.
  */
case class SqEncode(child: Expression, mins: Array[Double],
    ranges: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_encode"

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    SqEncodeUtil.encode(input.asInstanceOf[ArrayData], mins, ranges, childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val rgRef = ctx.addReferenceObj("sqRanges", ranges, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SqEncodeUtil.encode($c, $mnRef, $rgRef, $childIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): SqEncode =
    copy(child = newChild)
}

object SqEncodeUtil {
  /** Shared by interpreted eval and generated code (static forwarder). */
  def encode(v: ArrayData, mins: Array[Double], ranges: Array[Double],
      isFloat: Boolean): ArrayData = {
    val n = math.min(v.numElements(), mins.length)
    val out = new Array[Long](n)
    var d = 0
    while (d < n) {
      val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      out(d) = if (ranges(d) == 0.0) 0L
      else {
        val t = math.floor((x - mins(d)) / ranges(d) * 255.0).toLong
        if (t < 0L) 0L else if (t > 255L) 255L else t
      }
      d += 1
    }
    new GenericArrayData(out)
  }

  def column(v: Column, mins: Array[Double], ranges: Array[Double]): Column =
    ColumnBridge.column(SqEncode(ColumnBridge.expression(v), mins, ranges))
}
