package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality audit over the warehouse schema — the
  * dbt-tests / Great-Expectations surface a pipeline runs before it
  * TRUSTS a snapshot: foreign-key orphan counts, primary-key duplicate
  * counts, and null/range contract violations, emitted as one tall
  * (check, n_bad, n_scanned) frame a release gate can assert on (the
  * q64/q115 gate discipline applied to the relational layer).
  *
  * Scale shape: ONE fact-side pass per audited table — every check on a
  * table rides the same scan as a conditional count inside a single wide
  * aggregate, and the 1-row result is unpivoted to tall (check, n_bad)
  * rows with `stack()` (the q197 pattern). The r12 shape — one projection
  * of the aggregate per check, unioned — was column-pruned by the
  * optimizer into a DIFFERENT aggregate per branch (24 scans, zero
  * ReusedExchange in its own PLANS.md dump); `stack()` keeps all checks
  * in ONE aggregate so each audited table is scanned exactly once
  * (asserted per table in IntegritySpec). FK membership comes from
  * DISTINCT parent key-set joins: nation/region/customer key sets are
  * dimension-sized and broadcast at any scale, but `o_orderkey` /
  * `p_partkey` key sets are FACT-sized at TPC-H scale — at 100 TB those
  * two FK checks shuffle-join on the key (or probe a bloom filter built
  * from the parent side); the hint below pins broadcast only at fixture/
  * bench scale. Composite-key uniqueness uses an injective integer
  * encoding (l_orderkey·100 + l_linenumber, linenumber < 100 by
  * construction) so the distinct count stays a plain long agg in both
  * engines.
  */
object Integrity {

  private def parentKeys(df: DataFrame, key: String): DataFrame =
    df.select(col(key)).distinct().withColumn(s"__in_$key", lit(true))

  // ---------------------------------------------------------------- q194
  def q194IntegrityAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def t(n: String): DataFrame = Tables(s, dir, n)

    /** One audited table: a single WIDE aggregate over one scan; each
      * check is (name, bad-count column). The 1-row aggregate is unpivoted
      * to tall rows by ONE `stack()` — never N projections of the
      * aggregate, which the optimizer column-prunes into N separate
      * aggregates each rescanning the table (the r12 regression). */
    def audit(table: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
      val agg = table.agg(count(lit(1)).as("__n"),
        checks.map { case (n, c) => c.as(n) }: _*)
      // names are interpolated into SQL both as a literal and as an
      // identifier — escape quotes and backtick the identifier so a
      // future check name with a space/quote/keyword cannot mangle the
      // generated stack() (ADVICE r13)
      agg.selectExpr(
        s"stack(${checks.size}, " +
          checks.map { case (n, _) =>
            s"'${n.replace("'", "''")}', `${n.replace("`", "``")}`"
          }.mkString(", ") +
          ") as (check_name, n_bad)",
        "cast(__n as bigint) as n_scanned")
    }
    def orphans(key: String, parent: String): Column =
      count(when(col(key).isNotNull && col(s"__in_$parent").isNull, 1))
    def dups(keys: Column): Column =
      count(lit(1)) - countDistinct(keys)
    def nulls(key: String): Column = count(when(col(key).isNull, 1))

    val li = audit(
      t("lineitem")
        .join(broadcast(parentKeys(t("orders"), "o_orderkey")),
          $"l_orderkey" === $"o_orderkey", "left")
        .join(broadcast(parentKeys(t("part"), "p_partkey")),
          $"l_partkey" === $"p_partkey", "left")
        .join(broadcast(parentKeys(t("supplier"), "s_suppkey")),
          $"l_suppkey" === $"s_suppkey", "left"),
      Seq(
        "fk_lineitem_order" -> orphans("l_orderkey", "o_orderkey"),
        "fk_lineitem_part" -> orphans("l_partkey", "p_partkey"),
        "fk_lineitem_supplier" -> orphans("l_suppkey", "s_suppkey"),
        "pk_lineitem" -> dups($"l_orderkey" * 100L + $"l_linenumber"),
        "chk_lineitem_qty_positive" ->
          count(when($"l_quantity".isNull || $"l_quantity" <= 0, 1)),
        "chk_lineitem_discount_range" ->
          count(when($"l_discount".isNull ||
            $"l_discount" < 0 || $"l_discount" > 1, 1))))
    val ord = audit(
      t("orders")
        .join(broadcast(parentKeys(t("customer"), "c_custkey")),
          $"o_custkey" === $"c_custkey", "left"),
      Seq(
        "fk_orders_customer" -> orphans("o_custkey", "c_custkey"),
        "pk_orders" -> dups($"o_orderkey"),
        "chk_orders_date_null" -> nulls("o_orderdate")))
    val cust = audit(
      t("customer")
        .join(broadcast(parentKeys(t("nation"), "n_nationkey")),
          $"c_nationkey" === $"n_nationkey", "left"),
      Seq(
        "fk_customer_nation" -> orphans("c_nationkey", "n_nationkey"),
        "pk_customer" -> dups($"c_custkey")))
    val supp = audit(
      t("supplier")
        .join(broadcast(parentKeys(t("nation"), "n_nationkey")),
          $"s_nationkey" === $"n_nationkey", "left"),
      Seq(
        "fk_supplier_nation" -> orphans("s_nationkey", "n_nationkey"),
        "pk_supplier" -> dups($"s_suppkey")))
    val nat = audit(
      t("nation")
        .join(broadcast(parentKeys(t("region"), "r_regionkey")),
          $"n_regionkey" === $"r_regionkey", "left"),
      Seq(
        "fk_nation_region" -> orphans("n_regionkey", "r_regionkey"),
        "pk_nation" -> dups($"n_nationkey")))
    val reg = audit(t("region"), Seq("pk_region" -> dups($"r_regionkey")))
    val docs = audit(t("documents"), Seq(
      "pk_documents" -> dups($"doc_id"),
      "chk_documents_text_null" -> nulls("text")))
    val emb = audit(
      t("embeddings")
        .join(broadcast(parentKeys(t("documents"), "doc_id")),
          $"vec_id" === $"doc_id", "left"),
      Seq(
        "fk_embeddings_document" -> orphans("vec_id", "doc_id"),
        "pk_embeddings" -> dups($"vec_id")))

    Seq(li, ord, cust, supp, nat, reg, docs, emb)
      .reduce(_.unionByName(_))
      .orderBy($"check_name")
  }

  val q194Oracle: String = {
    def arm(src: String, checks: Seq[(String, String)]): String =
      checks.map { case (n, _) =>
        s"SELECT '$n' AS check_name, $n AS n_bad, __n AS n_scanned FROM $src"
      }.mkString("\nUNION ALL ")
    def agg(checks: Seq[(String, String)]): String =
      ("CAST(COUNT(*) AS BIGINT) AS __n" +:
        checks.map { case (n, e) => s"CAST($e AS BIGINT) AS $n" })
        .mkString(",\n    ")
    def orphan(k: String, p: String): String =
      s"COUNT(CASE WHEN $k IS NOT NULL AND $p IS NULL THEN 1 END)"
    val liChecks = Seq(
      "fk_lineitem_order" -> orphan("l_orderkey", "po.o_orderkey"),
      "fk_lineitem_part" -> orphan("l_partkey", "pp.p_partkey"),
      "fk_lineitem_supplier" -> orphan("l_suppkey", "ps.s_suppkey"),
      "pk_lineitem" ->
        "COUNT(*) - COUNT(DISTINCT l_orderkey * 100 + l_linenumber)",
      "chk_lineitem_qty_positive" ->
        "COUNT(CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 1 END)",
      "chk_lineitem_discount_range" ->
        "COUNT(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 1 THEN 1 END)")
    val ordChecks = Seq(
      "fk_orders_customer" -> orphan("o_custkey", "pc.c_custkey"),
      "pk_orders" -> "COUNT(*) - COUNT(DISTINCT o_orderkey)",
      "chk_orders_date_null" ->
        "COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END)")
    val custChecks = Seq(
      "fk_customer_nation" -> orphan("c_nationkey", "pn.n_nationkey"),
      "pk_customer" -> "COUNT(*) - COUNT(DISTINCT c_custkey)")
    val suppChecks = Seq(
      "fk_supplier_nation" -> orphan("s_nationkey", "pn.n_nationkey"),
      "pk_supplier" -> "COUNT(*) - COUNT(DISTINCT s_suppkey)")
    val natChecks = Seq(
      "fk_nation_region" -> orphan("n_regionkey", "pr.r_regionkey"),
      "pk_nation" -> "COUNT(*) - COUNT(DISTINCT n_nationkey)")
    val regChecks = Seq("pk_region" -> "COUNT(*) - COUNT(DISTINCT r_regionkey)")
    val docChecks = Seq(
      "pk_documents" -> "COUNT(*) - COUNT(DISTINCT doc_id)",
      "chk_documents_text_null" -> "COUNT(CASE WHEN text IS NULL THEN 1 END)")
    val embChecks = Seq(
      "fk_embeddings_document" -> orphan("vec_id", "pd.doc_id"),
      "pk_embeddings" -> "COUNT(*) - COUNT(DISTINCT vec_id)")
    s"""WITH li AS (
       |  SELECT ${agg(liChecks)}
       |  FROM lineitem l
       |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) po
       |    ON po.o_orderkey = l.l_orderkey
       |  LEFT JOIN (SELECT DISTINCT p_partkey FROM part) pp
       |    ON pp.p_partkey = l.l_partkey
       |  LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) ps
       |    ON ps.s_suppkey = l.l_suppkey),
       |ord AS (
       |  SELECT ${agg(ordChecks)}
       |  FROM orders o
       |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) pc
       |    ON pc.c_custkey = o.o_custkey),
       |cust AS (
       |  SELECT ${agg(custChecks)}
       |  FROM customer c
       |  LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) pn
       |    ON pn.n_nationkey = c.c_nationkey),
       |supp AS (
       |  SELECT ${agg(suppChecks)}
       |  FROM supplier s
       |  LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) pn
       |    ON pn.n_nationkey = s.s_nationkey),
       |nat AS (
       |  SELECT ${agg(natChecks)}
       |  FROM nation n
       |  LEFT JOIN (SELECT DISTINCT r_regionkey FROM region) pr
       |    ON pr.r_regionkey = n.n_regionkey),
       |reg AS (SELECT ${agg(regChecks)} FROM region),
       |docs AS (SELECT ${agg(docChecks)} FROM documents),
       |emb AS (
       |  SELECT ${agg(embChecks)}
       |  FROM embeddings e
       |  LEFT JOIN (SELECT DISTINCT doc_id FROM documents) pd
       |    ON pd.doc_id = e.vec_id)
       |SELECT * FROM (
       |${arm("li", liChecks)}
       |UNION ALL ${arm("ord", ordChecks)}
       |UNION ALL ${arm("cust", custChecks)}
       |UNION ALL ${arm("supp", suppChecks)}
       |UNION ALL ${arm("nat", natChecks)}
       |UNION ALL ${arm("reg", regChecks)}
       |UNION ALL ${arm("docs", docChecks)}
       |UNION ALL ${arm("emb", embChecks)})
       |ORDER BY check_name""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q194_integrity_audit" -> q194IntegrityAudit _,
  )

  val oracles: Map[String, String] = Map(
    "q194_integrity_audit" -> q194Oracle,
  )
}
