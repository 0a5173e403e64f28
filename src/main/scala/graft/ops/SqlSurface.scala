package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{GraftFunctions, Tables}

/** q93 — the SQL function surface exercised END-TO-END: the whole query is
  * a `spark.sql` string over the injected `graft.functions` expressions
  * ([[graft.GraftFunctions.registerAll]] / `GraftExtensions`), so the
  * SQL-registration path — parser → FunctionBuilder → codegen'd Catalyst
  * expression — is oracle-checked, not just spec-checked (VERDICT r7 #8).
  * The query is a q53/q91 twin plus the scalar hash family: djb2,
  * rolling_hash, simhash32, simhash64, shingle_hashes, all through SQL
  * text. Results are identical to the Column-API queries because both
  * paths build the same Catalyst expressions — which is the claim this
  * query gates.
  *
  * Plan shape: identical to q53/q91/q43 — one map-only codegen'd
  * projection over the documents scan; the only exchange is the
  * presentation ORDER BY. The SQL surface adds zero plan overhead: by the
  * time Catalyst sees it, there is no difference from the Column API.
  */
object SqlSurface {

  def q93SqlSurface(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.registerAll(s)
    Tables(s, dir, "documents").createOrReplaceTempView("documents_sql")
    s.sql("""
      SELECT doc_id,
        djb2(text) AS text_djb2,
        rolling_hash(text) AS fingerprint,
        simhash32(split(text, ' ')) AS simhash,
        simhash64(split(text, ' ')) AS simhash64,
        CAST(size(shingle_hashes(split(text, ' '), 3)) AS BIGINT) AS n_shingles
      FROM documents_sql ORDER BY doc_id""")
  }

  /** The 32- and 64-bit sketch CTEs share internal names (tok/th/bits), so
    * each rides in its own derived table; the scalar columns mirror q20's
    * djb2 and q43's rolling hash. */
  val q93Oracle: String =
    s"""SELECT d.doc_id, ${Sql.djb2("text")} AS text_djb2,
       |  ${Sql.rollingHash("text")} AS fingerprint,
       |  s32.simhash, s64.simhash64,
       |  CAST(CASE WHEN len(string_split(text, ' ')) >= 3
       |       THEN len(string_split(text, ' ')) - 2 ELSE 0 END AS BIGINT)
       |    AS n_shingles
       |FROM documents d
       |JOIN (WITH ${Dedup.simhashCte}
       |      SELECT doc_id, simhash FROM sk) s32 ON d.doc_id = s32.doc_id
       |JOIN (WITH ${Dedup.simhash64Cte}
       |      SELECT doc_id, simhash64 FROM sk64) s64 ON d.doc_id = s64.doc_id
       |ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_sql_surface" -> q93SqlSurface _,
  )

  val oracles: Map[String, String] = Map(
    "q93_sql_surface" -> q93Oracle,
  )
}
