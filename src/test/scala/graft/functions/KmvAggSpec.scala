package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM properties of the KMV sketch buffer: the reduce/merge algebra
  * must equal brute-force "sorted distinct, take k" under ANY split of the
  * input into partials and ANY merge order — that is the order-insensitivity
  * contract every custom Aggregator needs at scale (partials arrive in
  * arbitrary order across partitions).
  */
class KmvAggSpec extends AnyFunSuite {

  private def brute(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("reduce one-by-one equals sorted-distinct-take-k") {
    val agg = new KmvAgg(8)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val xs = Seq.fill(rnd.nextInt(60))(rnd.nextInt(30).toLong)
      val got = xs.foldLeft(agg.zero)(agg.reduce)
      assert(got.toSeq === brute(xs, 8))
    }
  }

  test("merge of arbitrary splits in shuffled order equals the one-pass sketch") {
    val agg = new KmvAgg(16)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val xs = Seq.fill(120)(rnd.nextInt(200).toLong)
      val nChunks = 1 + rnd.nextInt(6)
      val chunks = rnd.shuffle(xs.grouped(math.max(1, xs.size / nChunks)).toSeq)
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      assert(merged.toSeq === brute(xs, 16))
    }
  }

  test("below k kept values the sketch is exhaustive (exact distinct set)") {
    val agg = new KmvAgg(64)
    val xs = Seq(5L, 3L, 5L, 9L, 3L, 1L)
    assert(xs.foldLeft(agg.zero)(agg.reduce).toSeq === Seq(1L, 3L, 5L, 9L))
  }

  test("buffer never exceeds k and stays sorted distinct") {
    val agg = new KmvAgg(4)
    val rnd = new scala.util.Random(11)
    var b = agg.zero
    for (_ <- 1 to 500) {
      b = agg.reduce(b, rnd.nextLong())
      assert(b.length <= 4)
      assert(b.toSeq === b.toSeq.distinct.sorted)
    }
  }
}
