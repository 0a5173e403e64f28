package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Distributed Bloom filter — the membership prefilter a 100 TB refresh
  * pipeline puts in front of its exact-verify join (the same idea Spark's
  * own runtime row-level bloom pruning applies to join sides;
  * spark.sql.optimizer.runtime.bloomFilter.*).
  *
  * Build is pure DataFrame algebra, shaped for partial aggregation: each
  * key explodes to its k bit positions map-side, the positions reduce to
  * (word index → OR of masks) through a map-side-combined `bit_or` groupBy
  * — at most m/64 groups survive per partition, so the shuffle carries
  * ≤ words × partitions rows no matter how large the corpus. The merged
  * word array is bounded metadata (m/8 bytes — 16 KiB at the default m),
  * collected and baked into the probe expression exactly like
  * [[NearestCells]] bakes its centroid matrix.
  *
  * Probe is a codegen'd [[BloomMightContain]] over builtin xxhash64 inputs:
  * no false negatives by construction (a key's bits are all set once built),
  * false positives ≈ (k·n/m)^k — prefilter only, every positive is
  * exact-verified downstream, so query RESULTS never depend on the hash
  * choice. Positions follow Kirsch–Mitzenmacher: pos_i = pmod(h1 + i·h2, m)
  * with h2 forced odd (coprime with the power-of-two m).
  */
object BloomFns {
  /** Probes per key; m bits (power of two). Defaults sized so the fixture
    * corpora sit far below the FP knee; production sizes m ≈ 10–15 bits
    * per expected key for ~1% FP. */
  val K = 5
  val MBits = 1 << 17

  /** The two hash streams feeding the K–M position schedule — builtin
    * (codegen'd) xxhash64, the second salted by an extra literal column and
    * forced odd, both reduced into [0, 2³¹) so the schedule's
    * `h1 + i·h2` stays far from Long overflow (ANSI mode makes wrapping
    * arithmetic an ERROR on the DataFrame build side — the reduction keeps
    * build and probe on exact, non-wrapping math). Shared by build and
    * probe so the bit positions agree bit-for-bit. */
  private val HashMod = 1L << 31
  private def hashCols(key: Column): (Column, Column) =
    (pmod(xxhash64(key), lit(HashMod)),
      pmod(xxhash64(key, lit(0x27d4eb2fL)), lit(HashMod)).bitwiseOR(lit(1L)))

  /** Build the filter over a single-column DataFrame of keys (any hashable
    * type — xxhash64 takes the column as-is). Returns the filled word
    * array (length MBits/64). */
  def build(keys: DataFrame, k: Int = K, mBits: Int = MBits): Array[Long] = {
    val keyCol = col(keys.columns.head)
    val (h1, h2) = hashCols(keyCol)
    val pos = explode(array((0 until k).map(i =>
      pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))): _*))
    val words = keys.select(pos.as("p"))
      .select(shiftright(col("p"), 6).cast("int").as("w"),
        expr("shiftleft(1L, cast(p % 64 as int))").as("m"))
      .groupBy(col("w")).agg(bit_or(col("m")).as("bits"))
      .collect()
    val out = new Array[Long](mBits / 64)
    words.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Probe column: true iff `key` might be in the built filter. */
  def mightContain(key: Column, words: Array[Long], k: Int = K,
      mBits: Int = MBits): Column = {
    val (h1, h2) = hashCols(key)
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(h1), ColumnBridge.expression(h2), words, k, mBits))
  }
}

/** Codegen'd k-probe bit test over a baked word array; children are the two
  * precomputed xxhash64 streams (see [[BloomFns.hashCols]]). */
case class BloomMightContain(left: Expression, right: Expression,
    words: Array[Long], k: Int, mBits: Int) extends BinaryExpression {
  require(Integer.bitCount(mBits) == 1, "mBits must be a power of two")
  require(words.length == mBits / 64, "word array does not match mBits")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(h1: Any, h2: Any): Any =
    BloomUtil.contains(words, h1.asInstanceOf[Long], h2.asInstanceOf[Long],
      k, mBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BloomUtil.contains($wordsRef, $a, $b, $k, $mBits)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomUtil {
  /** Shared by interpreted eval and generated code. Inputs are the REDUCED
    * hash streams (< 2³¹ — see BloomFns.hashCols), so `h1 + i·h2` is exact;
    * `%` equals pmod on the non-negative operands, and 1L << pos masks the
    * shift to pos % 64 — identical positions to the build side. */
  def contains(words: Array[Long], h1: Long, h2: Long, k: Int,
      mBits: Int): Boolean = {
    var i = 0
    while (i < k) {
      val pos = ((h1 + i.toLong * h2) % mBits).toInt
      if ((words(pos >>> 6) & (1L << pos)) == 0L) return false
      i += 1
    }
    true
  }
}
