package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2 J): an `Aggregator[IN, BUF, OUT]` for the
  * exact weighted mean.
  *
  * Order-insensitivity is the correctness constraint for any custom
  * aggregate at scale (partials merge in arbitrary order across
  * partitions): the buffer keeps an exact decimal numerator — addition is
  * commutative/associative over decimals, unlike doubles — so the result is
  * identical no matter how Spark splits/merges, and hash-matches the DuckDB
  * oracle's decimal formulation.
  *
  * Each input contributes `round6(v·w)`, mirroring
  * `CAST(value * w AS DECIMAL(18,6))` (Spark and DuckDB both round the
  * canonical decimal representation of the double).
  */
object WeightedMeanAgg extends Aggregator[(Double, Long), (JBigDecimal, Long), Double] {
  override def zero: (JBigDecimal, Long) = (JBigDecimal.ZERO, 0L)

  override def reduce(b: (JBigDecimal, Long), in: (Double, Long)): (JBigDecimal, Long) = {
    val term = JBigDecimal.valueOf(in._1 * in._2).setScale(6, RoundingMode.HALF_UP)
    (b._1.add(term), b._2 + in._2)
  }

  override def merge(a: (JBigDecimal, Long), b: (JBigDecimal, Long)): (JBigDecimal, Long) =
    (a._1.add(b._1), a._2 + b._2)

  override def finish(r: (JBigDecimal, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1.doubleValue() / r._2.toDouble

  override def bufferEncoder: Encoder[(JBigDecimal, Long)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** KMV (k-minimum-values) distinct-cardinality sketch as a typed
  * `Aggregator` (Bar-Yossef et al. 2002, Beyer et al. SIGMOD 2007): the
  * buffer is the sorted array of the k smallest DISTINCT hash values seen.
  * Two properties make it the scale path for cross-source overlap audits
  * (q173):
  *
  *  - it deduplicates INSIDE the sketch (binary-search insert), so it
  *    consumes the raw exploded shingle stream — no corpus-wide
  *    `distinct()` shuffle is ever paid, and map-side partial aggregation
  *    reduces each task's contribution to ≤ k longs per group before the
  *    exchange;
  *  - sketches of different sets COMPOSE: merging two k-arrays and keeping
  *    the k smallest IS the sketch of the union, so pairwise union /
  *    intersection estimates are pure array arithmetic over 20-row
  *    metadata, never a data join.
  *
  * Order-insensitive by construction (set semantics), hence deterministic
  * under any partitioning — the DuckDB oracle reproduces it with a
  * row_number()-over-hash-order window. Estimator (k-th smallest of a
  * uniform [0,M) hash population): N̂ = (k−1)·M / h_(k); below k kept
  * values the sketch is exhaustive and exact.
  */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, h)
    if (i >= 0) b // already in the sketch
    else {
      val ins = -i - 1
      if (b.length >= k && ins >= k) b // larger than the current k-th min
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
