package graft

/** Dev tool: print the executed plan of named registry queries against
  * a small fixture (`runMain graft.PlanDump q1_agg,q2_star_join
  * [fixtureDir]`, default `/root/testdata/sf0.01`) — the .explain
  * feedback loop the build rules demand, without writing a throwaway
  * spec. PlanSpec pins the properties permanently; this is for
  * iterating toward the plan worth pinning.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args(0).split(",")) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
