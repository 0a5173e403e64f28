package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[PlaneBands]] must be bit-identical to the interpreted higher-order
  * formulation (`aggregate(sequence(…))` over the LCG plane values) — that
  * HOF fold is what the DuckDB oracle mirrors (`list_reduce`), so any
  * divergence here would silently break the q54/q56 hash-match. The spec
  * recomputes every band key of every sf0.001 embedding through the HOF
  * path and diffs.
  */
class PlaneBandsSpec extends SparkSpec {

  private def planeVal(i: Column, d: Column): Column =
    ((lit(1103515245L) * (i * 64 + d) + lit(12345L)) % lit(2147483648L))
      .cast("double") / lit(2147483648.0) - lit(0.5)

  private def lshDot(v: Column, i: Column): Column =
    aggregate(sequence(lit(0), lit(63)), lit(0.0),
      (acc, d) => acc + element_at(v, d + 1).cast("double") * planeVal(i, d))

  /** Band key via the interpreted path: (b << beta) | sign bits, MSB first. */
  private def hofBandKey(v: Column, b: Int, beta: Int): Column = {
    val bits = (0 until beta).foldLeft(lit(0L)) { (acc, j) =>
      acc * 2 + when(lshDot(v, lit(b * beta + j)) >= 0, 1L).otherwise(0L)
    }
    lit(b.toLong * (1L << beta)) + bits
  }

  test("PlaneBands equals the interpreted hyperplane fold on every embedding") {
    val s = spark
    import s.implicits._
    for ((nPlanes, beta) <- Seq((16, 2), (8, 8))) {
      val nb = nPlanes / beta
      val hof = array((0 until nb).map(b => hofBandKey($"embedding", b, beta)): _*)
      val mismatches = Tables(s, sf, "embeddings")
        .select(VecFns.planeBands($"embedding", nPlanes, beta).as("fast"), hof.as("slow"))
        .filter($"fast" =!= $"slow")
        .count()
      assert(mismatches === 0, s"nPlanes=$nPlanes beta=$beta")
    }
  }

  test("PlaneBands property: random vectors (negatives, zeros, magnitudes)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 60).map { i =>
      val v = Array.fill(64)((rnd.nextFloat() - 0.5f) * math.pow(10,
        rnd.nextInt(5) - 2).toFloat)
      if (i % 7 == 0) v(rnd.nextInt(64)) = 0.0f // exact zeros in the fold
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v")
    val hof = array((0 until 8).map(b => hofBandKey($"v", b, 2)): _*)
    val bad = df.select(VecFns.planeBands($"v", 16, 2).as("fast"), hof.as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(bad === 0)
    // structural: key b lies in [b·4, b·4+3] — bands can never collide
    // across band indexes
    val keys = df.select(VecFns.planeBands($"v", 16, 2).as("ks"))
      .as[Seq[Long]].collect()
    for (ks <- keys; (k, b) <- ks.zipWithIndex)
      assert(k >= b * 4 && k < b * 4 + 4, s"band $b key $k")
  }
}
