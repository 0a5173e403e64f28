package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    ev.printSchema()
    ev.selectExpr("min(ts)","max(ts)","min(unix_millis(ts))","min(user_id)","max(user_id)").show(false)
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    ord.printSchema()
    ord.selectExpr("min(o_orderdate)","max(o_orderdate)","min(o_custkey)","max(o_custkey)").show(false)
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet").selectExpr("sort_array(collect_set(c_mktsegment))").show(false)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").selectExpr("min(l_shipdate)","max(l_shipdate)","sort_array(collect_set(l_returnflag))","sort_array(collect_set(l_linestatus))").show(false)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").selectExpr("sort_array(collect_set(o_orderpriority))","sort_array(collect_set(o_orderstatus))").show(false)
    spark.stop()
  }
}
