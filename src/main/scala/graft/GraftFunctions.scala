package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** The engine's SQL surface: every scalar Catalyst expression in
  * `graft.functions` registered as a SQL function, so `spark.sql("SELECT
  * djb2(key), simhash32(shingle_hashes(tokens, 3)) …")` works exactly like
  * the `Column` API. Two entry points, one builder table:
  *
  *   - [[GraftExtensions]] — config-time injection (`spark.sql.extensions=
  *     graft.GraftExtensions`), the packaging a cluster deployment uses;
  *   - [[GraftFunctions.registerAll]] — runtime registration on a live
  *     session (tests, notebooks).
  *
  * Expressions whose constructors carry literal hyperparameters (shingle
  * width, plane counts) take them as foldable int/double literals in SQL —
  * exactly how Spark's own parameterized functions (e.g. `round`) do it.
  * Expressions parameterized by baked per-query metadata (NearestCells'
  * centroid table, PqEncode's codebooks, BloomMightContain's filter words)
  * stay Column-API-only: their metadata is query-derived, not a literal a
  * SQL author could sensibly inline.
  */
object GraftFunctions {

  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects a foldable integer literal, got $other")
  }

  private def doubleArg(name: String, e: Expression): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: Float, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case Literal(v: Long, _) => v.toDouble
    // SQL decimal literals (`0.25`) parse to DecimalType
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$name expects a foldable numeric literal, got $other")
  }

  /** name → (usage, builder). One table serves both entry points. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("djb2", "djb2(str) — JS-ToInt32 djb2 hash (partitioner/index.js:51 semantics)",
      { case Seq(c) => Djb2Hash(c) }),
    ("rolling_hash", "rolling_hash(str) — mod-1e9+7 polynomial fingerprint",
      { case Seq(c) => RollingHash(c) }),
    ("simhash32", "simhash32(array<string>) — 32-bit SimHash of a token array",
      { case Seq(c) => SimHash32(c) }),
    ("simhash64", "simhash64(array<string>) — 64-bit two-view SimHash of a token array",
      { case Seq(c) => SimHash64(c) }),
    ("shingle_hashes", "shingle_hashes(array<string>, n) — djb2 hashes of word n-grams",
      { case Seq(c, n) => ShingleHashes(c, intArg("shingle_hashes", n)) }),
    ("minhash_sig_h", "minhash_sig_h(array<long>, k) — k-permutation MinHash signature",
      { case Seq(c, k) => MinHashSigH(c, intArg("minhash_sig_h", k)) }),
    ("prefix_tokens", "prefix_tokens(str, n) — first n whitespace tokens joined, NULL if fewer",
      { case Seq(c, n) => PrefixTokens(c, intArg("prefix_tokens", n)) }),
    ("sorted_intersect_count", "sorted_intersect_count(a, b) — merge-walk |a ∩ b| over sorted arrays",
      { case Seq(a, b) => SortedIntersectCount(a, b) }),
    ("dot_prod", "dot_prod(a, b) — left-fold double dot product",
      { case Seq(a, b) => DotProd(a, b) }),
    ("plane_bands", "plane_bands(vec, nPlanes, beta) — banded hyperplane sign sketch",
      { case Seq(v, n, b) =>
        PlaneBands(v, intArg("plane_bands", n), intArg("plane_bands", b)) }),
    ("jl_project", "jl_project(vec, outDims, scale) — ±1 Johnson-Lindenstrauss projection",
      { case Seq(v, d, sc) =>
        JlProject(v, intArg("jl_project", d), doubleArg("jl_project", sc)) }),
  )

  /** Register every function on a live session (temp-function scope). */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, usage, builder) =>
      org.apache.spark.sql.graft.FunctionBridge
        .register(spark, name, usage, builder)
    }
}

/** `spark.sql.extensions`-compatible injection of the engine's Catalyst
  * surface — `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `--conf spark.sql.extensions=graft.GraftExtensions`:
  *
  *  - the scalar function table above,
  *  - [[graft.plans.CatalogJoinReorder]], the stream-maintained-catalog
  *    join reorder rule (a verbatim no-op until the session points
  *    `spark.graft.join.catalog` at a catalog root), and
  *  - [[graft.plans.SkewSaltJoin]], the automatic hot-key salt rewrite
  *    off the same catalog (additionally gated on
  *    `spark.graft.join.salt`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder))
    }
    ext.injectOptimizerRule(graft.plans.CatalogJoinReorder.apply)
    ext.injectOptimizerRule(graft.plans.SkewSaltJoin.apply)
  }
}
