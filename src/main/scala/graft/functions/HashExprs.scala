package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document-fingerprinting / sketching expressions for the dedup operators
  * (SURVEY.md §7 M5 north-star surface). All are deterministic and mirrored
  * exactly by DuckDB oracle SQL (see graft.ops.Dedup), so their outputs are
  * hash-checkable.
  */
object HashFns {
  /** Rolling polynomial fingerprint: h ← (h·31 + charCode) mod 1e9+7. */
  def fingerprint(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  /** 32-bit SimHash over a token array (multiset semantics): bit j is set
    * iff Σ_tokens (2·bit_j(djb2(t)) − 1) > 0. */
  def simhash32(tokens: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(tokens)))

  /** 64-bit SimHash over a token array: bits 0–31 come from djb2(t), bits
    * 32–63 from djb2(t ⧺ "#") — two independent 32-bit views instead of a
    * 64-bit multiply-mix, because the DuckDB oracle must reproduce the
    * hash and BIGINT multiplication overflows (errors, not wraps) there.
    * Doubles the q53 sketch width so banded Hamming search stops
    * saturating as the corpus grows (see Dedup.scala q65 width caveat). */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** MinHash signature (k permutations) over a STRING shingle array:
    * sig_i = min_s ((2i+1)·djb2(s) + (7919i+13)) mod (2^31 − 1). Composed
    * from two codegen'd expressions (per-element [[Djb2Hash]], then
    * [[MinHashSigH]]) rather than a dedicated case class — the former
    * string-keyed `MinHashSig` expression was the library's last
    * CodegenFallback and had no registered consumer (q52 hashes shingles
    * up front and feeds [[minhashFromHashes]]); the composition keeps the
    * convenience API with zero interpreted paths. */
  def minhash(shingles: Column, k: Int): Column =
    minhashFromHashes(
      org.apache.spark.sql.functions.transform(shingles, s => Djb2.djb2(s)), k)

  /** MinHash from pre-hashed shingles (array<long> of djb2 values) — same
    * signature as [[minhash]] over the corresponding strings. */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigH(ColumnBridge.expression(hashes), k))

  /** djb2 hashes of word n-gram shingles, computed in one pass over the
    * token array without materializing shingle strings: the char stream fed
    * to djb2 is token ⧺ ' ' ⧺ token …, identical to
    * `Djb2.hash(tokens.slice(i, i+n).mkString(" "))`. Long keys instead of
    * ~20-char strings also make the downstream inverted-index join ~6×
    * cheaper (measured) — at 100 TB the shuffle carries 8-byte keys.
    */
  def shingleHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n))

  /** Cardinality of the intersection of two SORTED-ascending long arrays —
    * a two-pointer merge walk: no per-pair hash set, no materialized result
    * array (what `size(array_intersect(a, b))` would pay per candidate
    * pair). Both inputs must be distinct and sorted; equals DuckDB
    * `len(list_intersect(a, b))` on the same arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  val MinHashP: Long = 2147483647L

  def minhashPerm(j: Int, h: Long): Long =
    ((2L * j + 1L) * h + (7919L * j + 13L)) % MinHashP

  def rollingHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * 31L + s.charAt(i).toLong) % 1000000007L; i += 1 }
    h
  }

  // --- static eval bodies, shared by the interpreted path (nullSafeEval)
  // --- and generated code (doGenCode calls these through the object's
  // --- static forwarders — same pattern as [[rollingHash]] above)

  def simhash32Arr(arr: ArrayData): Long = {
    val bal = new Array[Int](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = Djb2.hash(arr.getUTF8String(i).toString)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) bal(j) += 1 else bal(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (bal(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  def simhash64Arr(arr: ArrayData): Long = {
    val bal = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val t = arr.getUTF8String(i).toString
      // one fold over t serves both views: h2 extends the raw state by a
      // single '#' step — identical to Djb2.hash(t + "#") bit-for-bit,
      // without re-hashing the token (this runs in the q91/q67/q93 scans)
      val raw = Djb2.raw(t)
      val h1 = math.abs(raw)
      val h2 = math.abs(Djb2.step(raw, '#'))
      var j = 0
      while (j < 32) {
        if (((h1 >> j) & 1L) == 1L) bal(j) += 1 else bal(j) -= 1
        if (((h2 >> j) & 1L) == 1L) bal(j + 32) += 1 else bal(j + 32) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (bal(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  @inline private def djb2Step(h0: Long, c: Char): Long =
    ((h0.toInt << 5).toLong) + h0 + c.toLong

  def shingleHashesArr(toks: ArrayData, n: Int): ArrayData = {
    val nTok = toks.numElements()
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val strs = new Array[String](nTok)
    var i = 0
    while (i < nTok) { strs(i) = toks.getUTF8String(i).toString; i += 1 }
    val out = new Array[Long](nTok - n + 1)
    var s0 = 0
    while (s0 <= nTok - n) {
      var h = 5381L
      var t = 0
      while (t < n) {
        if (t > 0) h = djb2Step(h, ' ')
        val s = strs(s0 + t)
        var j = 0
        val len = s.length
        while (j < len) { h = djb2Step(h, s.charAt(j)); j += 1 }
        t += 1
      }
      out(s0) = math.abs(h)
      s0 += 1
    }
    new GenericArrayData(out)
  }

  def minhashFromHashesArr(arr: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = minhashPerm(j, h)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def sortedIntersectCountArr(xs: ArrayData, ys: ArrayData): Long = {
    val nx = xs.numElements()
    val ny = ys.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Codegen'd scalar: stays inside whole-stage codegen on the scan. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    HashFns.rollingHash(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFns.rollingHash($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Codegen'd: the per-token 32-bit balance loop runs ~|tokens|·32 iterations
  * per row, which made interpreted evaluation (CodegenFallback boxing + the
  * broken whole-stage span) the dominant cost of the q53 scan — measured
  * 1.63 s vs ~0.3 s map-only peers at sf0.1. The generated code calls the
  * shared static body, staying inside the scan's WholeStageCodegen.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"
  override protected def nullSafeEval(input: Any): Any =
    HashFns.simhash32Arr(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFns.simhash32Arr($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** 64-bit twin of [[SimHash32]] — same per-token balance loop over twice
  * the width, same codegen shape (static body call inside the scan's
  * whole-stage span). See [[HashFns.simhash64]] for the two-view hash
  * construction and why it is oracle-expressible.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    HashFns.simhash64Arr(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFns.simhash64Arr($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash over pre-hashed shingles (array<long>) — codegen'd (k·|hs|
  * multiply-mod iterations per row; the q52 signature pass is a hot scan). */
case class MinHashSigH(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig_h"
  override protected def nullSafeEval(input: Any): Any =
    HashFns.minhashFromHashesArr(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFns.minhashFromHashesArr($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigH =
    copy(child = newChild)
}

/** One-pass djb2 hashing of word n-gram shingles over a token array — see
  * [[HashFns.shingleHashes]]. Returns an empty array when there are fewer
  * than n tokens (mirrors [[TextFns.shingles]]). Codegen'd: this runs on
  * every document scan of the dedup family (q51/q52/q63 prep).
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashFns.shingleHashesArr(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashFns.shingleHashesArr($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Intersection cardinality of two sorted-ascending distinct long arrays
  * (two-pointer merge) — see [[HashFns.sortedIntersectCount]]. Codegen'd:
  * it runs once per candidate pair in the dedup verification join, and a
  * CodegenFallback here would break that stage's whole-stage span.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashFns.sortedIntersectCountArr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashFns.sortedIntersectCountArr($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
