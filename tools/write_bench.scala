// Microbenchmark of the sharded index WRITE path (guide §1.4/§6): the
// same (repartition(shard) + partitionBy(shard)) parquet write every
// written-index member uses, timed against a noop sink of the same
// computation, so the write/commit overhead separates from the
// fingerprint compute. Toggles: committer v1/v2, _SUCCESS marker off,
// zstd. Run:
//
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 /opt/spark/bin/spark-shell \
//     --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//     --driver-memory 8g \
//     --jars target/scala-2.13/flink1111spark_2.13-0.1.0.jar \
//     -I tools/write_bench.scala < /dev/null
{
  import org.apache.spark.sql.functions._
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  val docs = graft.Tables.load(spark, sfDir, "documents")
    .filter(col("text").isNotNull)
  val assets = graft.operators.Multimodal.attachPayload(docs, "text")
    .select(col("doc_id").as("asset_id"), col("payload"))
    .localCheckpoint()
  def frames = graft.operators.Multimodal
    .frameFingerprints(assets, "asset_id", 64)
    .withColumn("shard", substring(col("fingerprint"), 1, 2))
  def time(tag: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"WRITE_BENCH $tag t=${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  // warm
  frames.count()
  time("noop_compute_only") {
    frames.write.format("noop").mode("overwrite").save()
  }
  time("noop_compute_only_rerun") {
    frames.write.format("noop").mode("overwrite").save()
  }
  time("repartition_noop") {
    frames.repartition(col("shard"))
      .write.format("noop").mode("overwrite").save()
  }
  Seq(("v1_default", Map[String, String]()),
    ("v2_committer", Map(
      "mapreduce.fileoutputcommitter.algorithm.version" -> "2")),
    ("v2_nosuccess", Map(
      "mapreduce.fileoutputcommitter.algorithm.version" -> "2",
      "mapreduce.fileoutputcommitter.marksuccessfuljobs" -> "false")),
    ("v1_nosuccess", Map(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs" -> "false"))
  ).foreach { case (tag, conf) =>
    conf.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v) }
    (1 to 2).foreach { i =>
      time(s"write_$tag$i") {
        frames.repartition(col("shard"))
          .write.mode("overwrite").partitionBy("shard")
          .parquet(s"/tmp/write_bench_$tag")
      }
    }
    conf.keys.foreach(spark.sparkContext.hadoopConfiguration.unset)
  }
  // file-count + bytes of one layout
  val p = new org.apache.hadoop.fs.Path("/tmp/write_bench_v1_default")
  val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  val sum = fs.getContentSummary(p)
  println(s"WRITE_BENCH layout files=${sum.getFileCount} bytes=${sum.getLength}")
}
System.exit(0)
