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
}
