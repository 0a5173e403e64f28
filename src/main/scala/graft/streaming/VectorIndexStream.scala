package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Similarity

/** S10 — streaming vector-index refresh: the ANN analog of S8's corpus
  * refresh. Batches of new embeddings are assigned to their IVF cell
  * MAP-SIDE (the codegen'd NearestCells projection against the coarse
  * quantizer trained ONCE from the standing corpus — bounded centroid
  * metadata, the q59 discipline) and appended to a cell-partitioned index;
  * a probe then reads ONLY its nprobe cells through partition pruning, so
  * fresh vectors are searchable one micro-batch after arrival without any
  * index rebuild.
  *
  * Layout/idempotency: each batch writes `index/batch=<id>/cell=<c>/…` —
  * `partitionBy(cell)` under an overwrite of the batch's own partition
  * (the S8 protocol): a replayed at-least-once batch re-derives the same
  * assignment (pure function of batch × fixed centroids) and overwrites
  * itself, so the index never double-counts. Both `batch` and `cell`
  * surface as inferred partition columns on read; probes filter on `cell`,
  * which prunes at the directory level across every batch.
  *
  * At 100 TB the centroid table is the trained nlist-row quantizer (still
  * bounded metadata); the per-batch work is one codegen'd projection plus
  * a partitioned append of the batch's own rows — no shuffle, no touch of
  * the standing index. Re-training drift is a periodic BATCH job (rebuild
  * centroids, rewrite the index) — deliberately out of the hot path, as in
  * any production IVF serving stack.
  */
object VectorIndexStream {

  /** One batch's index write: map-side cell assignment + overwrite of the
    * batch's own partition. Deterministic in (batch, centroids), so an
    * at-least-once replay of the same batchId rewrites identical rows —
    * the S8 idempotency protocol, exercised directly by the spec. */
  private[streaming] def writeBatch(batch: DataFrame, batchId: Long,
      root: String, cells: Array[Long], cents: Array[Array[Double]]): Unit =
    batch
      .withColumn("cell", element_at(
        graft.functions.NearestCellsUtil.column(col("embedding"), cells, cents, 1), 1))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(s"$root/index/batch=$batchId")

  /** Streaming driver. `vecs` must carry (vec_id long, embedding
    * array<float>). Cells come from `corpusDir`'s trained centroids. */
  def run(vecs: DataFrame, corpusDir: String, root: String,
      trigger: Trigger = Trigger.AvailableNow())(
      implicit s: SparkSession): StreamingQuery = {
    val (cells, cents) = Similarity.ivfCentroidMeta(s, corpusDir)
    vecs.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, root, cells, cents)
      }
      .start()
  }

  /** Probe the streamed index: exact cosine top-k inside the query's
    * `nprobe` nearest cells — the q59 read path over the streaming layout.
    * The cell filter prunes partition directories across all batches. */
  def probe(s: SparkSession, root: String, corpusDir: String,
      queryVec: Seq[Float], k: Int = 3, nprobe: Int = 2): DataFrame = {
    import s.implicits._
    val (cells, cents) = Similarity.ivfCentroidMeta(s, corpusDir)
    val probeCells = nearestCells(queryVec, cells, cents, nprobe)
    val q = typedLit(queryVec)
    s.read.parquet(s"$root/index")
      .filter($"cell".isin(probeCells: _*))
      .withColumn("cos", graft.functions.VecFns.cosine(q, $"embedding"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(k)
      .select($"vec_id", $"cell", $"cos")
  }

  /** Driver-side nearest-cell pick for the (single) probe vector — the
    * same cosine-to-centroid rule as the NearestCells expression,
    * INCLUDING its NaN order: `Double.compare` sorts NaN greatest, so a
    * degenerate zero-norm centroid (NaN cosine for every vector) is
    * probed first, matching where the write side routed those vectors —
    * a `sortBy(-cos)` would instead sort NaN last and make probes miss
    * the very cell the index assigned. */
  private def nearestCells(v: Seq[Float], cells: Array[Long],
      cents: Array[Array[Double]], nprobe: Int): Seq[Long] = {
    val vd = v.map(_.toDouble).toArray
    val vn = math.sqrt(vd.map(x => x * x).sum)
    cells.zip(cents).map { case (c, cent) =>
      var dot = 0.0
      var i = 0
      while (i < cent.length) { dot += vd(i) * cent(i); i += 1 }
      val cn = math.sqrt(cent.map(x => x * x).sum)
      (c, dot / (vn * cn))
    }.sortWith { case ((ca, cosa), (cb, cosb)) =>
      val cmp = java.lang.Double.compare(cosb, cosa) // desc, NaN greatest
      if (cmp != 0) cmp < 0 else ca < cb
    }.take(nprobe).map(_._1).toSeq
  }
}
