// Stage-by-stage decomposition of the winnow small-delta probe at a
// scaled fixture (guide §1.1 empirical loop): times each prefix of the
// probe pipeline with a noop sink so the expensive operator isolates.
//
//   SPARK_GRAFT_SF_DIR=/tmp/sf1 /opt/spark/bin/spark-shell \
//     --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//     --driver-memory 16g \
//     --jars target/scala-2.13/flink1111spark_2.13-0.1.0.jar \
//     -I tools/probe_decompose.scala < /dev/null
{
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
  val work = s"/tmp/probe_band_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
  val docs = graft.Tables.load(spark, sfDir, "documents")
  val small = docs.filter(col("doc_id") % 97 === 5)
  docs.count() // warm
  def time(tag: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"DECOMP $tag t=${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  // replicate winnowPairsIndexed's internals step by step (winnowSets
  // is private — inline the same projection)
  graft.functions.WinnowExpression.ensureRegistered(spark)
  val qfps = small
    .select(col("source").cast("string").as("blk"),
      col("doc_id").cast("long").as("doc_id"),
      regexp_replace(graft.operators.TextOps.normalize(col("text")), " ", "")
        .as("norm"))
    .withColumn("hs", expr("winnow_fp(norm, 7, 4)"))
    .select(col("blk"), explode(col("hs")).as("h"))
    .distinct().localCheckpoint()
  println("DECOMP qfps_built")
  time("qfps_count") { qfps.count() }
  val shards = qfps.select(pmod(col("h"), lit(256)).cast("int").as("shard"))
    .distinct().collect().map(_.getInt(0))
  println(s"DECOMP shards=${shards.length}")
  val scan = spark.read.parquet(s"$work/postings")
    .filter(col("shard").isin(shards.toSeq: _*))
  time("scan_only") { noop(scan) }
  time("scan_only2") { noop(scan) }
  val semi = scan.join(broadcast(qfps), Seq("blk", "h"), "leftsemi")
  time("scan_semi") { noop(semi) }
  time("scan_semi2") { noop(semi) }
  println(s"DECOMP survivors=${semi.count()}")
  val capped = semi
    .withColumn("posting_n",
      count(lit(1)).over(Window.partitionBy(col("blk"), col("h"))))
    .filter(col("posting_n") > 1 && col("posting_n") <= 10000)
  time("scan_semi_capwindow") { noop(capped) }
  time("scan_semi_capwindow2") { noop(capped) }
  val grouped = capped
    .groupBy(col("blk"), col("h"))
    .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
  time("plus_collect") { noop(grouped) }
  val pairs = grouped
    .select(col("blk"), posexplode(col("ds")).as(Seq("i", "a")), col("ds"))
    .select(col("blk"), col("a"),
      explode(expr("slice(ds, i + 2, size(ds))")).as("b"))
    .filter(col("a") < col("b"))
  time("plus_pairs") { noop(pairs) }
  println(s"DECOMP rawpairs=${pairs.count()}")
  val aggd = pairs
    .groupBy(col("blk"), col("a.doc_id").as("doc_a"),
      col("b.doc_id").as("doc_b"), col("a.n").as("na"),
      col("b.n").as("nb"))
    .agg(count(lit(1)).as("i")).filter(col("i") >= 2L)
  time("plus_minshared") { noop(aggd) }
  time("full_probe") {
    noop(graft.operators.Dedup.winnowPairsIndexed(spark, work, small,
      "doc_id", "text", "source"))
  }
  time("full_probe2") {
    noop(graft.operators.Dedup.winnowPairsIndexed(spark, work, small,
      "doc_id", "text", "source"))
  }
}
System.exit(0)
