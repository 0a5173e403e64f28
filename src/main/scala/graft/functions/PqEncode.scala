package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Map-side product-quantization encoder: splits the child vector into
  * `M = codebooks.length` contiguous subspaces (dims / M each) and assigns
  * every subvector to its nearest codebook entry by squared L2 distance —
  * the standard PQ sub-quantizer metric (argmin Σ_d (x_d − c_d)², ties to
  * the lower code). Returns the M positional code ids as `array<long>`.
  *
  * Codebooks are bounded driver metadata (M × ≤2^codeBits entries × subDim
  * doubles — the same class as [[NearestCells]]' centroid matrix), baked
  * into the expression as a literal, so a 100 TB corpus is encoded in a
  * single codegen'd projection over the scan with ZERO exchange; the
  * encoded corpus stores M small ints (packable to M·codeBits bits) per
  * vector instead of the full float array — the memory compression that
  * makes billion-scale ANN fit in RAM.
  *
  * Arithmetic is bit-compatible with the DuckDB oracle: the squared
  * distance accumulates left-to-right over dims in doubles (the oracle's
  * `list_reduce` fold order) with explicit `(x−c)·(x−c)` products (never
  * `pow`), and tie-breaks use strict `Double.compare < 0` — the
  * `row_number() ORDER BY dist ASC, code ASC` ordering.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    PqEncodeUtil.encode(input.asInstanceOf[ArrayData], codebooks, childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqEncodeUtil.encode($c, $cbRef, $childIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Codegen'd gather-sum: `Σ_m table[m][codes[m]]`, accumulated left-to-right
  * in m order — the ADC inner loop (sum of per-subspace LUT partial dots)
  * and the reconstruction-norm lookup, as a tight generated loop instead of
  * an interpreted `aggregate(sequence(...), element_at(element_at(...)))`
  * chain. Numerically identical to that HOF formulation and to the DuckDB
  * oracle's `list_reduce(list_prepend(0.0, list(x ORDER BY m)))` fold: same
  * values, same order, 0.0 seed. At 100 TB the ADC scan is the hot loop of
  * the whole PQ path — per-row lambda interpretation is the difference
  * between memory-bound and allocation-bound (the [[DotProd]] lesson).
  *
  * `codes` indexes 0-based; a code outside its table row is a null result
  * (nullIntolerant propagation keeps corrupt inputs loud, not silent). */
case class GatherSum(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gather_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val table = b.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), table.numElements())
    var acc = 0.0
    var i = 0
    while (i < m) {
      acc += table.getArray(i).getDouble(codes.getLong(i).toInt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $acc += $b.getArray($i).getDouble((int) $a.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GatherSum = copy(left = newLeft, right = newRight)
}

object GatherSum {
  def column(codes: Column, table: Column): Column =
    ColumnBridge.column(GatherSum(
      ColumnBridge.expression(codes), ColumnBridge.expression(table)))
}

object PqEncodeUtil {
  /** Shared by interpreted eval and generated code (static forwarder). */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val m = cb.length
    val subDim = v.numElements() / m
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      val entries = cb(mi)
      val off = mi * subDim
      var best = -1
      var bestDist = 0.0
      var ci = 0
      while (ci < entries.length) {
        val c = entries(ci)
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val x = if (isFloat) v.getFloat(off + d).toDouble else v.getDouble(off + d)
          val diff = x - c(d)
          dist += diff * diff
          d += 1
        }
        if (best < 0 || java.lang.Double.compare(dist, bestDist) < 0) {
          best = ci
          bestDist = dist
        }
        ci += 1
      }
      out(mi) = best.toLong
      mi += 1
    }
    new GenericArrayData(out)
  }

  def column(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), codebooks))
}
