package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Static bodies for [[PlaneBands]] — shared by the interpreted path and the
  * generated code (the same forwarder pattern as [[HashFns]]).
  */
object PlaneBandsUtil {
  /** Deterministic pseudo-random hyperplane component p(i,d) ∈ [−0.5, 0.5):
    * an LCG over the (plane, dim) index. MUST stay bit-identical to
    * `Similarity.planeVal` / `planeValSql` — integer arithmetic is exact in
    * both engines, so the plane is reproducible in the DuckDB oracle. */
  @inline def planeVal(i: Int, d: Int): Double =
    ((1103515245L * (i * 64L + d) + 12345L) % 2147483648L).toDouble /
      2147483648.0 - 0.5

  /** Banded sign-sketch of `v` against `nPlanes` hyperplanes, `beta` planes
    * per band: element b (of nPlanes/beta) is `b·2^beta + bits_b` where
    * bits_b folds the sign bits of planes b·beta … b·beta+beta−1 MSB-first.
    * Each projection is the same left-to-right double fold as the
    * higher-order `aggregate(sequence(0,63), …)` formulation (and the
    * oracle's list_reduce), so the signs — hence the keys — are
    * bit-identical across engines. */
  def bands(v: ArrayData, isFloat: Boolean, nPlanes: Int, beta: Int): ArrayData = {
    val n = math.min(64, v.numElements())
    val nb = nPlanes / beta
    val out = new Array[Long](nb)
    var b = 0
    while (b < nb) {
      var bits = 0L
      var j = 0
      while (j < beta) {
        val i = b * beta + j
        var acc = 0.0
        var d = 0
        while (d < n) {
          val xv = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
          acc += xv * planeVal(i, d)
          d += 1
        }
        bits = (bits << 1) | (if (acc >= 0.0) 1L else 0L)
        j += 1
      }
      out(b) = (b.toLong << beta) | bits
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd banded random-hyperplane sketch over a numeric vector column —
  * the candidate-generation key for embedding similarity self-joins (q54)
  * and, with a single band of 8 planes, the q56 ANN bucket. Runs
  * nPlanes·dim multiply-adds per row on the corpus scan; a CodegenFallback
  * (or the interpreted higher-order-function fold it replaces) would
  * dominate that scan's cost the same way the pre-codegen SimHash32 did.
  */
case class PlaneBands(child: Expression, nPlanes: Int, beta: Int)
    extends UnaryExpression {
  require(nPlanes % beta == 0, "nPlanes must be a multiple of beta")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "plane_bands"

  override protected def nullSafeEval(input: Any): Any =
    PlaneBandsUtil.bands(input.asInstanceOf[ArrayData], isFloat, nPlanes, beta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PlaneBandsUtil.bands($c, $isFloat, $nPlanes, $beta)")

  override protected def withNewChildInternal(newChild: Expression): PlaneBands =
    copy(child = newChild)
}
