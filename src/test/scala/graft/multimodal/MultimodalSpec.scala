package graft.multimodal

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {

  test("media table has the binary + typed-metadata schema") {
    val df = Multimodal.mediaTable(spark, sf)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("payload") === BinaryType)
    assert(types("kind") === StringType)
    assert(types("width") === IntegerType && types("height") === IntegerType)
    val kinds = df.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("stub feature extraction: deterministic, normalized, partition-preserving") {
    val s = spark
    import s.implicits._
    val media = Multimodal.mediaTable(s, sf).as[MediaRow].repartition(4)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.rdd.getNumPartitions === 4) // mapPartitions keeps layout
    val f1 = feats.collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.map(_.histogram.toSeq).toSeq === f2.map(_.histogram.toSeq).toSeq)
    // histogram of each nonempty payload sums to ~1 (normalized), 16 bins
    f1.take(20).foreach { f =>
      assert(f.histogram.length === 16)
      if (f.n_bytes > 0) assert(math.abs(f.histogram.sum - 1f) < 1e-3)
    }
  }

  test("q159 byte entropy matches a local integer fold; flags discriminate") {
    val s = spark
    import s.implicits._
    def qlog(x: Long): Long = {
      val b = java.lang.Long.toBinaryString(x).length
      val p = 1L << (b - 1)
      (b - 1).toLong * 1000 + (x - p) * 1000 / p
    }
    val docs = graft.Tables(s, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val n = bytes.length.toLong
      val counts = bytes.groupBy(b => b & 0xff).view.mapValues(_.length.toLong)
      val entNum = counts.values.map(c => c * (qlog(n) - qlog(c))).sum
      val printable = bytes.count(b => (b & 0xff) >= 32 && (b & 0xff) <= 126).toLong
      val pm = printable * 1000 / n
      val me = entNum / n
      (id, n, me, pm, pm >= 950, me >= 4000)
    }.sortBy(_._1).toSeq
    val got = Multimodal.q159MediaEntropy(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5), r.getBoolean(6))).toSeq
    assert(got === expected.map(e => (e._1, e._2, e._3, e._4, e._5, e._6)))
    // text-surrogate payloads read as text, and the entropy band actually
    // splits the corpus — neither flag is vacuous
    assert(got.forall(_._5))
    assert(got.exists(_._6) && got.exists(!_._6))
  }
}
