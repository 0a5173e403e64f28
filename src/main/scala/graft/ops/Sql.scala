package graft.ops

/** Snippet builders for the DuckDB oracle SQL.
  *
  * The driver re-runs every `SparkEntry.oracleSql` entry in DuckDB over the
  * same parquet tables and hash-compares with the Spark result, so every
  * snippet here is written to be *bit-identical* to the Spark-side plan:
  *   - double sums go through DECIMAL (exact, association-free) then back to
  *     DOUBLE;
  *   - djb2 mirrors the JS semantics of [[graft.functions.Djb2]] including
  *     the ToInt32 wrap on `h << 5` only;
  *   - pmod mirrors Spark's non-negative modulo.
  */
object Sql {
  /** Signed-32-bit wrap of a BIGINT expression (JS ToInt32). */
  def s32(x: String): String =
    s"((($x + 2147483648) % 4294967296 + 4294967296) % 4294967296 - 2147483648)"

  /** djb2 over an ASCII varchar column, matching graft.functions.Djb2.hash.
    * `(h << 5)` wraps via ToInt32 twice (coerce + shift); the additions do
    * not wrap. BIGINT is exact far beyond the JS double range used here.
    */
  def djb2(col: String): String = {
    val t = s32(s"${s32("h")} * 32")
    "abs(list_reduce(list_prepend(5381::BIGINT, " +
      s"list_transform(list_filter(string_split_regex($col, ''), c -> len(c) > 0), " +
      s"c -> unicode(c)::BIGINT)), (h, c) -> $t + h + c))"
  }

  /** Spark pmod (always non-negative). */
  def pmod(x: String, n: Long): String = s"((($x) % $n + $n) % $n)"

  /** Exact decimal sum surfaced as DOUBLE — matches
    * `sum(col.cast(DecimalType(18,scale))).cast("double")` on the Spark side.
    */
  def dsum(x: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Word n-gram shingles over a token-list expression — mirrors
    * [[graft.functions.TextFns.shingles]]. */
  def shingles(tokens: String, n: Int): String =
    s"CASE WHEN len($tokens) >= $n THEN list_transform(range(1, len($tokens) - ${n - 2}), " +
      s"sh_i -> array_to_string(($tokens)[sh_i:sh_i+${n - 1}], ' ')) ELSE []::VARCHAR[] END"

  /** Sequential-fold dot product over two 64-dim float lists, promoted to
    * double — mirrors [[graft.functions.VecFns.dot]] (0.0 seed, left fold →
    * bit-identical doubles). */
  def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
      s"dp_i -> CAST(($a)[dp_i] AS DOUBLE) * CAST(($b)[dp_i] AS DOUBLE))), (dp_x, dp_y) -> dp_x + dp_y)"

  /** Cosine similarity — mirrors [[graft.functions.VecFns.cosine]]. */
  def cosine(a: String, b: String): String =
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"

  /** Dot product of a float-element list against a double-element list
    * (only the float side is cast) — mirrors the mixed-type DotProd branch
    * used on the IVF vector×centroid path. */
  def dotFD(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
      s"dp_i -> CAST(($a)[dp_i] AS DOUBLE) * ($b)[dp_i])), (dp_x, dp_y) -> dp_x + dp_y)"

  /** Dot product of two double-element lists (no casts). */
  def dotD(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
      s"dp_i -> ($a)[dp_i] * ($b)[dp_i])), (dp_x, dp_y) -> dp_x + dp_y)"

  /** Deterministic LCG value in [−0.5, 0.5) over a non-negative integer
    * index expression — the hashed-embedding / trained-weight generator
    * (integer arithmetic is BIGINT-exact and the final divide is correctly
    * rounded, so the double is bit-identical in both engines). The ::BIGINT
    * cast matters: DuckDB otherwise multiplies in INT32 and overflows for
    * indexes ≥ ~2. */
  def lcg(idx: String): String =
    s"(CAST((1103515245::BIGINT * ($idx) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0 - 0.5)"

  /** Rolling polynomial fingerprint — mirrors
    * [[graft.functions.HashFns.rollingHash]]. */
  def rollingHash(col: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"list_filter(string_split_regex($col, ''), rh_c -> len(rh_c) > 0), " +
      s"rh_c -> unicode(rh_c)::BIGINT)), (rh_h, rh_c) -> (rh_h * 31 + rh_c) % 1000000007)"

  /** Piecewise-linear integer log₂ in milli-bits of a non-negative int64
    * expression `e` ≥ 1: (b−1)·1000 + (e − 2^(b−1))·1000 ÷ 2^(b−1) with
    * b = bit-length — the libm-free log the engine quantizes likelihoods
    * and entropies with (error ≤ 0.086 bits). Operands are non-negative,
    * so Spark's truncating `div` and DuckDB's flooring `//` agree; only
    * the shift spelling differs per dialect. */
  def qlogMilliDuck(e: String): String = {
    val p = s"(CAST(1 AS BIGINT) << (length(bin($e)) - 1))"
    s"(CAST(length(bin($e)) - 1 AS BIGINT) * 1000 + ((($e) - $p) * 1000) // $p)"
  }

  /** The Spark-SQL spelling of [[qlogMilliDuck]] (for `expr(...)`). */
  def qlogMilliSpark(e: String): String = {
    val p = s"shiftleft(CAST(1 AS BIGINT), length(bin($e)) - 1)"
    s"(CAST(length(bin($e)) - 1 AS BIGINT) * 1000 + (($e) - $p) * 1000 div $p)"
  }
}
