package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[JlProject]] must be bit-identical to the interpreted higher-order
  * formulation (`aggregate(sequence(…))` over the LCG ±1 signs) — that HOF
  * fold is what the DuckDB oracle mirrors (`list_reduce`), so any
  * divergence would silently break the q86 hash-match. The spec recomputes
  * every projected value of every sf0.001 embedding through the HOF path
  * and diffs, then repeats over adversarial random vectors.
  */
class JlProjectSpec extends SparkSpec {

  private def sign(i: Column, j: Column): Column = {
    val raw = (lit(1103515245L) * (i * 64 + j) + lit(12345L)) % lit(2147483648L)
    when(raw >= 1073741824L, lit(1.0)).otherwise(lit(-1.0))
  }

  private def hofProject(v: Column): Column =
    transform(sequence(lit(0), lit(15)), i =>
      lit(0.25) * aggregate(sequence(lit(0), lit(63)), lit(0.0),
        (acc, j) => acc + element_at(v, j + 1).cast("double") * sign(i, j)))

  test("JlProject equals the interpreted ±1 fold on every embedding") {
    val s = spark
    import s.implicits._
    val mismatches = Tables(s, sf, "embeddings")
      .select(VecFns.jlProject($"embedding", 16, 0.25).as("fast"),
        hofProject($"embedding").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("JlProject property: random vectors (negatives, zeros, magnitudes)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(59)
    val rows = (1 to 60).map { i =>
      val v = Array.fill(64)((rnd.nextFloat() - 0.5f) * math.pow(10,
        rnd.nextInt(5) - 2).toFloat)
      if (i % 7 == 0) v(rnd.nextInt(64)) = 0.0f // exact zeros in the fold
      (i.toLong, v)
    }
    val df = rows.toDF("id", "v")
    val bad = df.select(VecFns.jlProject($"v", 16, 0.25).as("fast"),
      hofProject($"v").as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(bad === 0)
  }
}
