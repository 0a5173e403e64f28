package graft

import org.apache.spark.sql.functions._

import graft.functions.{HashFns, TextFns, VecFns}

/** The SQL surface must compute EXACTLY what the Column API computes — the
  * functions are the same Catalyst expressions, so any divergence would
  * mean the SQL builders wire arguments wrong (e.g. a swapped literal).
  * Each test runs a spark.sql query over a temp view and diffs against the
  * Column formulation.
  */
class GraftFunctionsSpec extends SparkSpec {

  private lazy val registered: Unit = GraftFunctions.registerAll(spark)

  test("djb2 / rolling_hash / shingle_hashes / simhash32 / simhash64 via spark.sql equal the Column API") {
    val s = spark
    registered
    import s.implicits._
    Tables(s, sf, "documents").createOrReplaceTempView("docs_sqlfn")
    val viaSql = s.sql(
      """SELECT doc_id, djb2(text) AS h, rolling_hash(text) AS rh,
        |  simhash32(split(text, ' ')) AS sh,
        |  simhash64(split(text, ' ')) AS sh64,
        |  shingle_hashes(split(text, ' '), 3) AS shs
        |FROM docs_sqlfn ORDER BY doc_id""".stripMargin).collect()
    val viaCol = Tables(s, sf, "documents")
      .select($"doc_id", graft.functions.Djb2.djb2($"text").as("h"),
        HashFns.fingerprint($"text").as("rh"),
        HashFns.simhash32(TextFns.tokens($"text")).as("sh"),
        HashFns.simhash64(TextFns.tokens($"text")).as("sh64"),
        HashFns.shingleHashes(TextFns.tokens($"text"), 3).as("shs"))
      .orderBy($"doc_id").collect()
    assert(viaSql.map(_.toString).toSeq === viaCol.map(_.toString).toSeq)
  }

  test("dot_prod / plane_bands / jl_project via spark.sql equal the Column API") {
    val s = spark
    registered
    import s.implicits._
    Tables(s, sf, "embeddings").createOrReplaceTempView("emb_sqlfn")
    val viaSql = s.sql(
      """SELECT vec_id, dot_prod(embedding, embedding) AS d,
        |  plane_bands(embedding, 16, 2) AS pb,
        |  jl_project(embedding, 16, 0.25) AS jl
        |FROM emb_sqlfn ORDER BY vec_id""".stripMargin).collect()
    val viaCol = Tables(s, sf, "embeddings")
      .select($"vec_id", VecFns.dot($"embedding", $"embedding").as("d"),
        VecFns.planeBands($"embedding", 16, 2).as("pb"),
        VecFns.jlProject($"embedding", 16, 0.25).as("jl"))
      .orderBy($"vec_id").collect()
    assert(viaSql.map(_.toString).toSeq === viaCol.map(_.toString).toSeq)
  }

  test("prefix_tokens via spark.sql equals the Column API and the split twin") {
    val s = spark
    registered
    import s.implicits._
    Tables(s, sf, "documents").createOrReplaceTempView("docs_sqlfn3")
    val viaSql = s.sql(
      "SELECT doc_id, prefix_tokens(text, 8) AS p FROM docs_sqlfn3 ORDER BY doc_id")
      .collect()
    val viaCol = Tables(s, sf, "documents")
      .select($"doc_id",
        graft.functions.PrefixTokensFn.prefixTokens($"text", 8).as("p"))
      .orderBy($"doc_id").collect()
    assert(viaSql.map(_.toString).toSeq === viaCol.map(_.toString).toSeq)
    // the O(prefix) scan must equal the split-based formulation exactly,
    // including NULL for <n-token docs
    val twin = Tables(s, sf, "documents")
      .select($"doc_id",
        when(size(TextFns.tokens($"text")) >= 8,
          array_join(slice(TextFns.tokens($"text"), 1, 8), " ")).as("p"))
      .orderBy($"doc_id").collect()
    assert(viaCol.map(_.toString).toSeq === twin.map(_.toString).toSeq)
  }

  test("prefix_tokens edge cases: boundary counts, repeated spaces, empty string") {
    val s = spark
    registered
    import s.implicits._
    // (text, n) against the split-slice-join twin on hand-picked shapes:
    // exact-n docs (whole text), n-1 docs (NULL), consecutive spaces
    // (empty tokens count and the joined prefix preserves them), empty
    // string (one empty token), trailing space (trailing empty token)
    val cases = Seq(
      "a b c d", "a b c", "a  b  c", "", " ", "a ", " a", "a", "word",
      "a b c d e f g h i", "x  ", "  x")
    for (n <- Seq(1, 2, 3, 4)) {
      val df = cases.toDF("t")
      val got = df.select(
        graft.functions.PrefixTokensFn.prefixTokens($"t", n)).collect()
        .map(r => Option(r.getString(0)))
      val want = df.select(
        when(size(split($"t", " ")) >= n,
          array_join(slice(split($"t", " "), 1, n), " "))).collect()
        .map(r => Option(r.getString(0)))
      assert(got.toSeq === want.toSeq, s"n=$n over $cases")
    }
  }

  test("non-literal hyperparameters fail loudly, not silently") {
    val s = spark
    registered
    Tables(s, sf, "documents").createOrReplaceTempView("docs_sqlfn2")
    val e = intercept[Exception] {
      s.sql("SELECT shingle_hashes(split(text, ' '), doc_id) FROM docs_sqlfn2").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("GraftExtensions wires every builder into SparkSessionExtensions") {
    // getOrCreate in a shared-JVM suite would return the already-built
    // session and silently skip withExtensions, so the deployment path is
    // proven at the extensions object itself: applying GraftExtensions
    // must inject exactly the builder table.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    val injected = org.apache.spark.sql.graft.FunctionBridge.injectedFunctionNames(ext)
    assert(injected.toSet === GraftFunctions.builders.map(_._1).toSet)
  }
}
