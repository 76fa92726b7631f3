// Decomposes the winnow/substring INCREMENTAL PROBE cost (VERDICT r20
// weak items 1-2) into jobs + plan shape, at a given fixture dir.
// Builds the index once (idempotent per dir), then profiles the probe
// with the per-job listener and dumps the final plan. Run:
//
//   SPARK_GRAFT_SF_DIR=/tmp/sf1 /opt/spark/bin/spark-shell \
//     --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//     --driver-memory 16g \
//     --jars target/scala-2.13/flink1111spark_2.13-0.1.0.jar \
//     -I tools/probe_profile.scala < /dev/null
{
  import org.apache.spark.scheduler._
  import org.apache.spark.sql.functions._
  import scala.collection.mutable
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
  val work = s"/tmp/probe_band_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
  val workS = s"/tmp/probe_band_sub_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
  val docs = graft.Tables.load(spark, sfDir, "documents")
  val small = docs.filter(col("doc_id") % 97 === 5)
  val hfs = new org.apache.hadoop.fs.Path(work).getFileSystem(
    spark.sparkContext.hadoopConfiguration)
  if (!hfs.exists(new org.apache.hadoop.fs.Path(s"$work/postings"))) {
    graft.operators.Dedup.winnowWriteIndex(
      docs.filter(col("doc_id") % 97 =!= 5), work, "doc_id", "text", "source")
    graft.operators.Dedup.winnowAppendIndex(small, work, "doc_id", "text",
      "source")
  }
  if (!hfs.exists(new org.apache.hadoop.fs.Path(s"$workS/postings"))) {
    graft.operators.SubstringDedup.substringWriteIndex(
      docs.filter(col("doc_id") % 97 =!= 5), workS, "doc_id", "text", 12)
    graft.operators.SubstringDedup.substringAppendIndex(small, workS,
      "doc_id", "text", 12)
  }
  case class JobRec(id: Int, t0: Long, var t1: Long = 0L,
    var site: String = "", var nTasks: Int = 0)
  val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val r = JobRec(e.jobId, e.time)
      r.site = Option(e.properties.getProperty("callSite.short")).getOrElse("")
      r.nTasks = e.stageInfos.map(_.numTasks).sum
      jobs.synchronized { jobs(e.jobId) = r }
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
  })
  docs.count() // warm
  def profile(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
    Seq("cold", "warm").foreach { pass =>
      jobs.synchronized { jobs.clear() }
      val t0 = System.nanoTime()
      val df = mk
      val n = df.count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val snap = jobs.synchronized { jobs.values.toSeq }
      println(f"PROBE_PROFILE $tag [$pass] rows=$n total=$total%.2f s jobs=${snap.size}")
      snap.sortBy(r => -(r.t1 - r.t0)).take(12).foreach { r =>
        println(f"  job ${r.id}%4d ${(r.t1 - r.t0) / 1e3}%7.2f s tasks=${r.nTasks}%5d ${r.site}")
      }
      if (pass == "warm") {
        val buf = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
          df.explain("formatted")
        }
        val plan = buf.toString("UTF-8")
        // plan skeleton: operator lines only
        plan.linesIterator.takeWhile(_.nonEmpty).foreach(l => println("  " + l))
      }
    }
  }
  profile("winnow_small_delta") {
    graft.operators.Dedup.winnowPairsIndexed(spark, work, small,
      "doc_id", "text", "source")
  }
  profile("substring_small_delta") {
    graft.operators.SubstringDedup.substringPairsIndexed(spark, workS, small,
      "doc_id", "text", 12)
  }
}
System.exit(0)
