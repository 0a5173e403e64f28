package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Map-side IVF coarse-quantizer assignment: the k nearest centroids of a
  * vector, ordered by (cosine desc, cell id asc) — exactly the ordering of
  * `row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell)`, so
  * it is a drop-in replacement for the crossJoin(corpus × centroids) +
  * window formulation WITHOUT the shuffle: centroids are bounded driver
  * metadata (≤ nlist rows, same class as the signing upsert's ≤256 bucket
  * prefixes), baked into the expression as a literal matrix, and each
  * vector's cell is decided in a single codegen'd projection over the scan.
  * At 100 TB with nlist=1024 the window variant exchanges corpus×nlist
  * rows — a petabyte-class shuffle for a map-side decision; this is zero
  * exchange.
  *
  * Arithmetic is bit-compatible with the windowed original (and the DuckDB
  * oracle): dot products accumulate left-to-right in doubles ([[DotProd]]
  * order), ccos = dot(v,c) / (sqrt(dot(v,v)) · sqrt(dot(c,c))), and the
  * selection uses java.lang.Double.compare (NaN greatest — Spark's and
  * DuckDB's DESC ordering) with ties broken by the ascending cell order of
  * the constructor arrays.
  */
case class NearestCells(child: Expression, cells: Array[Long],
    cents: Array[Array[Double]], k: Int) extends UnaryExpression {
  require(cells.length == cents.length, "cells/centroid arity mismatch")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_cells"

  private def childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // sqrt(dot(c,c)) per centroid, precomputed once — the VALUE is identical
  // to the per-pair sqrt in the windowed formulation, so oracle-safe.
  private lazy val sqcc: Array[Double] = cents.map { c =>
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  override protected def nullSafeEval(input: Any): Any =
    NearestCellsUtil.nearest(input.asInstanceOf[ArrayData], cents, cells,
      sqcc, k, childIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val cellsRef = ctx.addReferenceObj("cells", cells, "long[]")
    val sqccRef = ctx.addReferenceObj("sqcc", sqcc, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NearestCellsUtil.nearest($c, $centsRef, $cellsRef, " +
        s"$sqccRef, $k, $childIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCellsUtil {
  /** Shared by interpreted eval and generated code (static forwarder). */
  def nearest(v: ArrayData, cents: Array[Array[Double]], cells: Array[Long],
      sqcc: Array[Double], k: Int, isFloat: Boolean): ArrayData = {
    val nv = v.numElements()
    var qq = 0.0
    var i = 0
    while (i < nv) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      qq += x * x
      i += 1
    }
    val sq = math.sqrt(qq)
    val m = cents.length
    val ccos = new Array[Double](m)
    var ci = 0
    while (ci < m) {
      val c = cents(ci)
      val n = math.min(nv, c.length)
      var dc = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        dc += x * c(j)
        j += 1
      }
      ccos(ci) = dc / (sq * sqcc(ci))
      ci += 1
    }
    // top-k selection by (ccos desc, cell asc): strict Double.compare > so
    // ties keep the earlier (smaller-cell) index; NaN sorts greatest, like
    // both engines' DESC ordering. nlist is small — selection sort is fine.
    val kk = math.min(k, m)
    val out = new Array[Long](kk)
    val taken = new Array[Boolean](m)
    var r = 0
    while (r < kk) {
      var best = -1
      var bi = 0
      while (bi < m) {
        if (!taken(bi) && (best < 0 || java.lang.Double.compare(ccos(bi), ccos(best)) > 0))
          best = bi
        bi += 1
      }
      taken(best) = true
      out(r) = cells(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  def column(v: Column, cells: Array[Long], cents: Array[Array[Double]],
      k: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(v), cells, cents, k))
}
