// Per-job profile of declared queries (guide §1: measure first).
// Runs each query named in SPARK_GRAFT_PROFILE (comma-separated) twice
// (cold + warm) with a listener that records every Spark job's wall
// time, task time, and the callsite, so a query's seconds decompose
// into its constituent jobs. Run via spark-shell with the packaged jar:
//
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
//   SPARK_GRAFT_PROFILE=q199_streaming_asset_ingest \
//     /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 --driver-memory 8g \
//     --jars target/scala-2.13/flink1111spark_2.13-0.1.0.jar \
//     -I tools/profile_query.scala < /dev/null
{
  import org.apache.spark.scheduler._
  import scala.collection.mutable
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val names = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "q1_agg")
    .split(",").toSeq
  case class JobRec(id: Int, t0: Long, var t1: Long = 0L,
    var desc: String = "", var site: String = "", var nTasks: Int = 0)
  val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
  val listener = new SparkListener {
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val r = JobRec(e.jobId, e.time)
      r.desc = Option(e.properties.getProperty("spark.job.description"))
        .getOrElse("")
      r.site = Option(e.properties.getProperty("callSite.short")).getOrElse("")
      r.nTasks = e.stageInfos.map(_.numTasks).sum
      jobs.synchronized { jobs(e.jobId) = r }
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
  }
  spark.sparkContext.addSparkListener(listener)
  // warm the session the way Bench does
  spark.range(1000).selectExpr("sum(id)").collect()
  graft.Tables.all.foreach(n => graft.Tables.load(spark, sfDir, n).count())
  val qmap = graft.SparkEntry.queries
  names.foreach { name =>
    val fn = qmap(name)
    Seq("cold", "warm").foreach { pass =>
      jobs.synchronized { jobs.clear() }
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      val snap = jobs.synchronized { jobs.values.toSeq }
      val jobSum = snap.map(r => (r.t1 - r.t0) / 1e3).sum
      println(f"PROFILE $name%s [$pass%s] total=$total%.2f s " +
        f"jobs=${snap.size}%d jobwall=$jobSum%.2f s " +
        f"gap=${total - jobSum}%.2f s")
      snap.sortBy(r => -(r.t1 - r.t0)).take(30).foreach { r =>
        println(f"  job ${r.id}%4d ${(r.t1 - r.t0) / 1e3}%7.2f s " +
          f"tasks=${r.nTasks}%4d ${r.site}%s ${r.desc.take(60)}%s")
      }
    }
  }
}
System.exit(0)
