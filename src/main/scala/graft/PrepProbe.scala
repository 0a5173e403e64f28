package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop probe for prep cold costs (not part of the driver contract). */
object PrepProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]"), "8")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM on an unrelated query
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { i =>
      graft.ops.Planner.evictSession(spark)
      val t0 = System.nanoTime()
      // the combined single-pass build: planner suite + both catalogs
      graft.ops.Planner.ensureArtifacts(spark, sf)
      println(f"planner_prep iter $i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
