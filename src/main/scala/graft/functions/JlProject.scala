package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static bodies for [[JlProject]] — shared by the interpreted path and the
  * generated code (the same forwarder pattern as [[PlaneBandsUtil]]).
  */
object JlProjectUtil {
  /** Deterministic ±1 Achlioptas sign for matrix entry (i, j): bit 30 of
    * the LCG over the flattened index. NOT the parity bit — the LCG's low
    * bit has period 2 in j, which would make adjacent input dims cancel
    * pairwise instead of mixing. MUST stay bit-identical to the q86 oracle
    * (`CASE WHEN (1103515245·(i·64+j)+12345) mod 2³¹ >= 2³⁰ THEN 1 ELSE -1`).
    */
  @inline def sign(i: Int, j: Int): Double = {
    val raw = (1103515245L * (i * 64L + j) + 12345L) % 2147483648L
    if (raw >= 1073741824L) 1.0 else -1.0
  }

  /** JL projection of `v` (≤64 dims) to `outDims` doubles, scaled by
    * 1/√16 = 0.25 for outDims = 16 — the fold over input dims is
    * left-to-right, the same order as the oracle's list_reduce, so the
    * output doubles are bit-identical across engines and parallelism. */
  def project(v: ArrayData, isFloat: Boolean, outDims: Int, scale: Double): ArrayData = {
    val n = math.min(64, v.numElements())
    val out = new Array[Double](outDims)
    var i = 0
    while (i < outDims) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * sign(i, j)
        j += 1
      }
      out(i) = scale * acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd Johnson–Lindenstrauss ±1 random projection over a numeric
  * vector column (array<double> of outDims). The sign matrix is regenerated
  * from the (out-dim, in-dim) index per element — nothing is materialized
  * or broadcast. outDims·dim multiply-adds per row on the corpus scan; the
  * interpreted higher-order `aggregate` fold this replaces is a
  * CodegenFallback that would dominate the scan the same way the
  * pre-codegen SimHash32 did.
  */
case class JlProject(child: Expression, outDims: Int, scale: Double)
    extends UnaryExpression {
  require(outDims > 0, "outDims must be positive")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jl_project"

  override protected def nullSafeEval(input: Any): Any =
    JlProjectUtil.project(input.asInstanceOf[ArrayData], isFloat, outDims, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JlProjectUtil.project($c, $isFloat, $outDims, $scale)")

  override protected def withNewChildInternal(newChild: Expression): JlProject =
    copy(child = newChild)
}
