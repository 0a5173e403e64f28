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
