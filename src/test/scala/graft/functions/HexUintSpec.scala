package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec

/** hex_uint must be bit-identical to the `conv(substr(...))` /
  * byte-swap `conv(concat(substr×4))` SQL chains it replaced in the
  * container parsers (Multimodal.scala) — the oracle parity of
  * q163/q176/q186/q188/q189 rides on this equivalence, so it is pinned
  * here against the ORIGINAL chains over adversarial inputs: truncated
  * strings (partial windows), positions at/past the end (clamped walks),
  * pos 0, non-hex characters (conv's prefix-parse rule), embedded and
  * leading spaces (conv trims the assembled string), lowercase hex, and
  * NULL h/pos.
  */
class HexUintSpec extends SparkSpec {

  private def hexUint(h: Column, pos: Column, le: Boolean, digits: Int) =
    ColumnBridge.column(HexUint(ColumnBridge.expression(h),
      ColumnBridge.expression(pos), ColumnBridge.expression(lit(le)), digits))

  /** The pre-r14 SQL chain for the same read. */
  private def oldChain(le: Boolean, digits: Int): String =
    if (!le) s"cast(conv(substr(h, cast(pos as int), $digits), 16, 10) as bigint)"
    else {
      val windows = ((digits / 2 - 1) to 0 by -1)
        .map(b => s"substr(h, cast(pos + ${2 * b} as int), 2)")
      s"cast(conv(concat(${windows.mkString(",")}), 16, 10) as bigint)"
    }

  test("equivalent to the original conv/substr chains on adversarial inputs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1213)
    val alphabet = "0123456789ABCDEFabcdef GZ!" // hex + trim/prefix traps
    val strings = Seq(null, "", " ", "  ", "G", " 1A ", "FFFFFFFF") ++
      (1 to 300).map { _ =>
        val n = rnd.nextInt(24)
        (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
    val rows = for {
      h <- strings
      pos <- Seq(0, 1, 2, 3, 5, 9, 15, 23, 40) // ≥ 0: the parsers' domain
    } yield (h, pos)
    val df = rows.toDF("h", "pos")
    for (le <- Seq(false, true); digits <- Seq(2, 4, 8)) {
      val cmp = df.select(
        $"h", $"pos",
        hexUint($"h", $"pos", le, digits).as("neo"),
        expr(oldChain(le, digits)).as("old"))
      val bad = cmp.filter(!($"neo" <=> $"old")).collect()
      assert(bad.isEmpty,
        s"le=$le digits=$digits diverges: ${bad.take(5).mkString("; ")}")
    }
    // NULL pos propagates like the casted-null position did
    val np = df.limit(3).select(
      hexUint($"h", lit(null).cast("long"), le = true, 8).as("neo"))
      .collect()
    assert(np.forall(_.isNullAt(0)))
  }

  test("interpreted and codegen paths agree") {
    val s = spark
    import s.implicits._
    val df = Seq(("0102030405060708", 3), ("FF", 1), ("", 1))
      .toDF("h", "pos")
    val withCg = df.select(hexUint($"h", $"pos", le = true, 8).as("v"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    // force the interpreted path through eval()
    val rows = Seq(("0102030405060708", 3), ("FF", 1), ("", 1)).map {
      case (h, p) =>
        val e = HexUint(
          org.apache.spark.sql.catalyst.expressions.Literal(
            org.apache.spark.unsafe.types.UTF8String.fromString(h)),
          org.apache.spark.sql.catalyst.expressions.Literal(p),
          org.apache.spark.sql.catalyst.expressions.Literal(true), 8)
        e.eval(null)
    }
    assert(withCg === rows)
  }
}
