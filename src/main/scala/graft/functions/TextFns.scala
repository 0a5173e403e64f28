package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Column builders for the text-analysis operators. Pure
  * `org.apache.spark.sql.functions` compositions — codegen'd, no UDFs.
  */
object TextFns {
  /** Whitespace tokenization (documents.text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as space-joined strings; empty array when the
    * document has fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + lit(1), lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Count of tokens contained in a fixed wordlist (multiset semantics). */
  def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(words), t))).cast("long")

  /** Total character length of all tokens (long). */
  def totalTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))

  /** Per-language stopword lists for the language-ID heuristic. Deliberately
    * tiny — the operator's contract is the deterministic argmax rule, not
    * linguistic accuracy (the fixture text is synthetic word soup).
    */
  val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "des", "et", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和"))
}

/** Column builders for vector similarity over `embedding: array<float>`.
  * Everything is promoted to double and folded left-to-right with a 0.0
  * seed, which the DuckDB oracle mirrors exactly (list_prepend(0.0, …) +
  * list_reduce) — the doubles come out bit-identical. The fold itself is
  * the codegen'd [[DotProd]] expression (same order, ~100× faster than the
  * interpreted higher-order-function formulation).
  */
object VecFns {
  import org.apache.spark.sql.graft.ColumnBridge

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProd(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine from a precomputed per-side norm — same doubles as [[cosine]]
    * (sqrt is computed once per vector instead of once per pair; the value
    * is identical, so the oracle is unchanged). */
  def cosinePrenorm(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** Banded random-hyperplane sketch (array<long> of nPlanes/beta band
    * keys) — see [[PlaneBands]]. */
  def planeBands(v: Column, nPlanes: Int, beta: Int): Column =
    ColumnBridge.column(PlaneBands(ColumnBridge.expression(v), nPlanes, beta))

  /** Johnson–Lindenstrauss ±1 projection to outDims doubles — see
    * [[JlProject]]. */
  def jlProject(v: Column, outDims: Int, scale: Double): Column =
    ColumnBridge.column(JlProject(ColumnBridge.expression(v), outDims, scale))
}
