package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q98 Z-order layout: the Morton interleave is bit-exact, and the tiling
  * delivers the bounded-bbox locality that makes min/max stats prune on
  * both dimensions.
  */
class LayoutSpec extends SparkSpec {

  test("morton10 interleave matches a hand bit-interleave") {
    val s = spark
    import s.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until 10).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L),
      (682L, 341L), (513L, 7L))
    val got = cases.toDF("x", "y")
      .select(Layout.morton10($"x", $"y").as("z")).collect().map(_.getLong(0))
    assert(got.toSeq === cases.map { case (x, y) => ref(x, y) })
    // the canonical small values: (x=1,y=0)→1, (x=0,y=1)→2, (x=1,y=1)→3
    assert(ref(1, 0) === 1L && ref(0, 1) === 2L && ref(1, 1) === 3L)
  }

  test("every 4096-key tile bounds a 64x64 block on the fixture") {
    val s = spark
    import s.implicits._
    val rows = Layout.q98ZorderLayout(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val area = r.getLong(6)
      assert(area <= 64L * 64L, s"tile ${r.getLong(0)} bbox $area exceeds 64x64")
      // bbox edges stay inside one 64-aligned block per dimension
      assert(r.getLong(2) / 64 === r.getLong(3) / 64, "x range crosses a block")
      assert(r.getLong(4) / 64 === r.getLong(5) / 64, "y range crosses a block")
    }
  }
}
