package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyring providers — the signing pipeline is provider-agnostic: anything
  * producing (key_id, address, priv) plugs into the broadcast join of
  * q22/[[graft.streaming.SigningStream]].
  *
  * The reference reads its keyring from Aurora Postgres
  * (signer/index.js:164–170: `SELECT address, encrypted_private_key FROM
  * keys`); the surrogate generator is the deterministic stand-in the
  * oracle can check. [[jdbc]] is the production reader.
  */
object Keyrings {

  /** Deterministic sha2-surrogate keyring — the oracle-checkable provider
    * (see [[Pipeline.keyring]], the single source of truth for specs and
    * the DuckDB mirror). */
  def surrogate(s: SparkSession, n: Int = 100): DataFrame =
    Pipeline.keyring(s, n)

  /** JDBC keyring reader — the Aurora-analog production provider. The
    * keyring is dimension-sized (hundreds of rows), so a single-partition
    * read is correct: no partitioning options, no predicate gymnastics —
    * the downstream join broadcasts it anyway. Column normalization makes
    * any source table with (key_id, address, priv)-compatible columns land
    * in the exact schema the signing join expects. */
  def jdbc(s: SparkSession, url: String, table: String,
      connProps: java.util.Properties = new java.util.Properties())
      : DataFrame =
    s.read.jdbc(url, table, connProps)
      .select(col("key_id").cast("long").as("key_id"),
        col("address").cast("string").as("address"),
        col("priv").cast("string").as("priv"))
}
