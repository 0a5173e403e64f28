package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VecFns

/** Approximate-nearest-neighbor search over `embeddings.embedding`
  * (`array<float>`, dim 64): brute-force cosine top-k as the correctness
  * baseline, and a random-hyperplane LSH-bucketed variant as the scale path
  * (candidates come from one hash-partitioned bucket join instead of the
  * full cross product).
  */
object Similarity {

  /** Deterministic pseudo-random hyperplane component p(i,d) ∈ [−0.5, 0.5):
    * an LCG over the (plane, dim) index — integer arithmetic is exact in
    * both engines, so the plane is bit-identical in the DuckDB oracle. */
  private def planeVal(i: Column, d: Column): Column =
    ((lit(1103515245L) * (i * 64 + d) + lit(12345L)) % lit(2147483648L)).cast("double") /
      lit(2147483648.0) - lit(0.5)

  private val planeValSql =
    "(CAST((1103515245 * (PL_I * 64 + PL_D) + 12345) % 2147483648 AS DOUBLE) / 2147483648.0 - 0.5)"

  /** Signed projection of v onto pseudo-plane i (sequential fold over dims). */
  private def lshDot(v: Column, i: Column): Column =
    aggregate(sequence(lit(0), lit(63)), lit(0.0),
      (acc, d) => acc + element_at(v, d + 1).cast("double") * planeVal(i, d))

  private[ops] def lshDotSql(v: String, i: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(0, 64), pd -> " +
      s"CAST(($v)[pd + 1] AS DOUBLE) * ${planeValSql.replace("PL_I", i).replace("PL_D", "pd")})), " +
      "(pa, pb) -> pa + pb)"

  /** 8-bit LSH bucket: sign bits of planes 0–7, plane 0 the MSB — a single
    * band of the codegen'd [[graft.functions.PlaneBands]] sketch (band 0's
    * key carries no band-index offset, so it IS the 8-bit bucket). The
    * interpreted higher-order fold this replaces ([[lshDot]], kept for the
    * oracle-SQL mirror and specs) computes the identical doubles — the
    * expression just runs them as a tight generated loop on the scan. */
  private def bucket(v: Column): Column =
    element_at(VecFns.planeBands(v, 8, 8), 1)

  private def bucketSql(v: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 8), pi -> " +
      s"CASE WHEN ${lshDotSql(v, "pi")} >= 0 THEN 1::BIGINT ELSE 0::BIGINT END)), " +
      "(ba, bb) -> ba * 2 + bb)"

  // ---------------------------------------------------------------- q55
  /** Brute-force cosine top-5 for 10 query vectors: broadcast the queries,
    * map-side cosine, per-query top-k window. At scale: queries are always
    * the broadcast side; the corpus scan stays shuffle-free until the final
    * per-query top-k (which AQE keeps tiny). */
  def q55AnnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings").withColumn("nrm", VecFns.norm($"embedding"))
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
    e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", VecFns.cosinePrenorm(
        VecFns.dot($"q_emb", $"embedding"), $"q_nrm", $"nrm"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"vec_id", $"cos")
      .orderBy($"q_id", $"rank")
  }

  val q55Oracle: String = {
    val cos = Sql.cosine("q.embedding", "v.embedding")
    s"""WITH sims AS (
       |  SELECT q.vec_id AS q_id, v.vec_id AS vec_id, $cos AS cos
       |  FROM embeddings q, embeddings v
       |  WHERE q.vec_id < 10 AND v.vec_id <> q.vec_id)
       |SELECT q_id, rank, vec_id, cos FROM (
       |  SELECT q_id, vec_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
       |  FROM sims)
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q56
  /** LSH-bucketed ANN: 8 random hyperplanes → 256 buckets; candidates are
    * only the query's own bucket, then exact cosine top-3 within it. The
    * bucket join is an equi-join on the bucket id — hash-partitionable, no
    * cross product; this is the 100 TB path (q55 is its correctness
    * baseline at test scale). */
  def q56AnnLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "embeddings").withColumn("bucket", bucket($"embedding"))
      .withColumn("nrm", VecFns.norm($"embedding"))
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"bucket", $"nrm".as("q_nrm"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
    e.join(broadcast(q), Seq("bucket"))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", VecFns.cosinePrenorm(
        VecFns.dot($"q_emb", $"embedding"), $"q_nrm", $"nrm"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"vec_id", $"bucket", $"cos")
      .orderBy($"q_id", $"rank")
  }

  val q56Oracle: String = {
    val cos = Sql.cosine("q.embedding", "v.embedding")
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket
       |  FROM embeddings),
       |sims AS (
       |  SELECT q.vec_id AS q_id, v.vec_id AS vec_id, q.bucket AS bucket, $cos AS cos
       |  FROM bucketed q JOIN bucketed v ON q.bucket = v.bucket
       |  WHERE q.vec_id < 10 AND v.vec_id <> q.vec_id)
       |SELECT q_id, rank, vec_id, bucket, cos FROM (
       |  SELECT q_id, vec_id, bucket, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
       |  FROM sims)
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q59
  /** IVF-flat ANN: (1) deterministic coarse centroids — per-label, per-dim
    * exact decimal means (k-means would be iteration-order-dependent; the
    * label grouping is the fixed coarse quantizer, the mean is the learned
    * part); (2) every vector assigned to its *nearest* centroid (computed,
    * not assumed — a vector may land outside its own label's cell);
    * (3) queries probe their top-2 cells (nprobe=2) and run exact cosine
    * top-3 inside them.
    *
    * Scale shape: the centroid table is bounded metadata (nlist rows), so
    * it is COLLECTED — same class as the signing upsert's ≤256 bucket
    * prefixes — and assignment is a single codegen'd map-side projection
    * ([[graft.functions.NearestCells]]): zero exchange from scan to cell
    * id. (The previous crossJoin(corpus × centroids) + row_number window
    * shuffled corpus×nlist rows to make a per-row decision — at 100 TB with
    * nlist=1024, a petabyte-class exchange.) The probe side broadcasts the
    * nprobe·|queries| rows into the candidate equi-join on cell, so the
    * corpus never shuffles at all before the final per-query top-k.
    * Candidates ≈ corpus·(nprobe/nlist); q55 (brute force) is the recall
    * baseline at test scale. */
  def q59AnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val emb = Tables(s, dir, "embeddings")
    val cent = emb
      .select($"label", posexplode($"embedding").as(Seq("d", "v")))
      .groupBy($"label", $"d")
      .agg((sum($"v".cast(DecimalType(18, 9))).cast(DoubleType) / count(lit(1))).as("m"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"d", $"m"))).as("dm"))
      .select($"label".cast("long").as("cell"),
        transform($"dm", x => x.getField("m")).as("centroid"))
    // nlist rows of 64 doubles — bounded driver metadata, not a data collect
    val centRows = cent.orderBy($"cell").collect()
    val cells = centRows.map(_.getLong(0))
    val mats = centRows.map(_.getSeq[Double](1).toArray)
    def nc(v: Column, k: Int): Column =
      graft.functions.NearestCellsUtil.column(v, cells, mats, k)
    val assigned = emb.select($"vec_id", $"embedding",
      element_at(nc($"embedding", 1), 1).as("cell"))
    val qprobe = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
        explode(nc($"embedding", 2)).as("cell"))
    val wTop = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
    assigned.join(broadcast(qprobe), Seq("cell"))
      .filter($"vec_id" =!= $"q_id")
      .withColumn("cos", VecFns.cosine($"q_emb", $"embedding"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter($"rank" <= 3)
      .select($"q_id", $"rank", $"vec_id", $"cell", $"cos")
      .orderBy($"q_id", $"rank")
  }

  val q59Oracle: String = {
    val ccos = s"(${Sql.dotFD("e.embedding", "c.centroid")} / " +
      s"(sqrt(${Sql.dot("e.embedding", "e.embedding")}) * sqrt(${Sql.dotD("c.centroid", "c.centroid")})))"
    val cos = Sql.cosine("q.q_emb", "a.embedding")
    s"""WITH cent AS (
       |  SELECT CAST(label AS BIGINT) AS cell, list(m ORDER BY d) AS centroid FROM (
       |    SELECT label, i AS d,
       |      CAST(SUM(CAST(embedding[i + 1] AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS m
       |    FROM embeddings CROSS JOIN range(0, 64) r(i)
       |    GROUP BY label, i)
       |  GROUP BY label),
       |scored AS (
       |  SELECT e.vec_id, e.embedding, c.cell, $ccos AS ccos
       |  FROM embeddings e CROSS JOIN cent c),
       |assigned AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS arn
       |    FROM scored)
       |  WHERE arn = 1),
       |qprobe AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell) AS crn
       |    FROM scored WHERE vec_id < 10)
       |  WHERE crn <= 2),
       |cand AS (
       |  SELECT q.q_id, a.vec_id, a.cell, $cos AS cos
       |  FROM qprobe q JOIN assigned a ON a.cell = q.cell AND a.vec_id <> q.q_id)
       |SELECT q_id, rank, vec_id, cell, cos FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
       |  FROM cand)
       |WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_ann_brute" -> q55AnnBrute _,
    "q56_ann_lsh" -> q56AnnLsh _,
    "q59_ann_ivf" -> q59AnnIvf _,
  )

  val oracles: Map[String, String] = Map(
    "q55_ann_brute" -> q55Oracle,
    "q56_ann_lsh" -> q56Oracle,
    "q59_ann_ivf" -> q59Oracle,
  )
}
