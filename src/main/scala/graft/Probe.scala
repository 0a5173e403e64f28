package graft
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "32")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    graft.ops.Integrity.q194IntegrityAudit(spark, sf)
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      time(s"q194 full iter $i") {
        graft.ops.Integrity.q194IntegrityAudit(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
