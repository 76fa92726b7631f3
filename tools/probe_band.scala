// Probe-only band measurement for the winnow PRUNED REGIME (BASELINE.md
// r20 band points): the q219 gate times the whole lifecycle (build +
// append + probe), which is corpus-linear by necessity — this script
// isolates the PROBE so the flat-delta claim is measured on the thing
// that claims it. Run via spark-shell with the packaged jar:
//
//   SPARK_GRAFT_SF_DIR=/tmp/sf1 /opt/spark/bin/spark-shell \
//     --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//     --driver-memory 16g \
//     --jars target/scala-2.13/flink1111spark_2.13-0.1.0.jar \
//     -I tools/probe_band.scala < /dev/null
{
  import org.apache.spark.sql.functions._
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
  val work = s"/tmp/probe_band_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
  val docs = graft.Tables.load(spark, sfDir, "documents")
  val small = docs.filter(col("doc_id") % 97 === 5) // the ~1% delta
  val big = docs.filter(col("doc_id") % 3 === 0)    // q190's third
  // build once per fixture dir (idempotent across reruns)
  val hfs = new org.apache.hadoop.fs.Path(work).getFileSystem(
    spark.sparkContext.hadoopConfiguration)
  if (!hfs.exists(new org.apache.hadoop.fs.Path(s"$work/postings"))) {
    graft.operators.Dedup.winnowWriteIndex(
      docs.filter(col("doc_id") % 97 =!= 5), work, "doc_id", "text",
      "source")
    graft.operators.Dedup.winnowAppendIndex(small, work, "doc_id", "text",
      "source")
  }
  def time(tag: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROBE_BAND $tag sf=$sfDir rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  docs.count() // warm the JVM/codegen on an unrelated action
  time("small_delta_probe") {
    graft.operators.Dedup.winnowPairsIndexed(spark, work, small,
      "doc_id", "text", "source").count()
  }
  time("small_delta_probe_rerun") {
    graft.operators.Dedup.winnowPairsIndexed(spark, work, small,
      "doc_id", "text", "source").count()
  }
  // the quarter-class worst case on the SAME index for contrast (its
  // pairs are not the indexed split's — a cost probe, not a gate)
  time("big_delta_probe") {
    graft.operators.Dedup.winnowPairsIndexed(spark, work, big,
      "doc_id", "text", "source").count()
  }
}
System.exit(0)
