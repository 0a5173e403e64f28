package graft.ops

import java.nio.file.Files
import java.sql.DriverManager

import graft.SparkSpec

/** The JDBC keyring provider against an embedded Derby database (the only
  * JDBC engine on the offline classpath) — proves the Aurora-analog read
  * path produces the same signatures as the surrogate provider.
  */
class KeyringsSpec extends SparkSpec {

  test("jdbc keyring provider is interchangeable with the surrogate") {
    val s = spark
    import s.implicits._
    val dbDir = Files.createTempDirectory("graft-derby-").toString + "/keys"
    val url = s"jdbc:derby:$dbDir;create=true"

    // seed the database with the SAME 100 rows the surrogate generates, via
    // plain JDBC (the reference seeds Aurora out-of-band the same way)
    val rows = Keyrings.surrogate(s).collect()
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        "CREATE TABLE keyring (key_id BIGINT, address VARCHAR(64), priv VARCHAR(64))")
      val ps = conn.prepareStatement("INSERT INTO keyring VALUES (?, ?, ?)")
      for (r <- rows) {
        ps.setLong(1, r.getAs[Long]("key_id"))
        ps.setString(2, r.getAs[String]("address"))
        ps.setString(3, r.getAs[String]("priv"))
        ps.executeUpdate()
      }
    } finally conn.close()

    val viaJdbc = Keyrings.jdbc(s, url, "keyring")
    assert(viaJdbc.count() === 100)
    assert(viaJdbc.schema.map(f => (f.name, f.dataType.typeName)).toSeq ===
      Seq(("key_id", "long"), ("address", "string"), ("priv", "string")))

    // both providers drive the signing transform to identical signatures
    val records = Seq(
      ("""{"id": "tx-1"}""", "raw/p0/a.json"),
      ("""{"id": "tx-2"}""", "raw/p1/b.json"),
      ("""{"id": "tx-3"}""", "raw/p2/c.json"),
    ).toDF("payload", "s3_path")
    def sign(keyring: org.apache.spark.sql.DataFrame) =
      graft.streaming.SigningStream.signRecords(records, keyring)
        .orderBy($"pk").collect().map(r =>
          (r.getAs[String]("pk"), r.getAs[Long]("key_id"),
            r.getAs[String]("signature"))).toSeq
    val a = sign(Keyrings.surrogate(s))
    val b = sign(viaJdbc)
    assert(a.length === 3) // every record resolved a key
    assert(a === b)
  }
}
