package graft.tools
object Explain153 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L*1024*1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.operators.ScaleOps.q153RevenueBridge(spark, sys.env("SPARK_GRAFT_SF_DIR"))
    df.write.format("noop").mode("overwrite").save()
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
