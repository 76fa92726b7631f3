// Serve-only band measurement for the retrieval stack (BASELINE.md r20
// — the q163 companion to tools/probe_band.scala): q163's lifecycle
// cost is the two corpus-linear index BUILDS; this script prebuilds
// both written indexes once per fixture (the gate's own build recipe)
// and times ONLY the serving path (shard-pruned BM25 + bucket-pruned
// IVF-PQ + RRF fusion) for the gate's 8-query batch. Run:
//
//   SPARK_GRAFT_SF_DIR=/tmp/sf1 /opt/spark/bin/spark-shell \
//     --master 'local[32]' --conf spark.sql.shuffle.partitions=32 \
//     --driver-memory 16g \
//     --jars target/scala-2.13/flink1111spark_2.13-0.1.0.jar \
//     -I tools/serve_band.scala < /dev/null
{
  import org.apache.spark.sql.functions._
  import graft.operators.{Retrieval, Pq, Similarity}
  graft.functions.VectorExpressions.ensureRegistered(spark)
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
  val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
  val lexPath = s"/tmp/serve_band_lex_$tag"
  val semPath = s"/tmp/serve_band_sem_$tag"
  val docs = graft.Tables.load(spark, sfDir, "documents")
  val emb = graft.Tables.load(spark, sfDir, "embeddings")
  val hfs = new org.apache.hadoop.fs.Path(lexPath).getFileSystem(
    spark.sparkContext.hadoopConfiguration)
  if (!hfs.exists(new org.apache.hadoop.fs.Path(s"$lexPath/postings"))) {
    Retrieval.bm25WriteIndex(docs, lexPath)
    // q163's own IVF-PQ build recipe (sampled coarse centroids, one
    // fixed-point Lloyd round on residual subvectors)
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val assigned = Similarity.ivfAssign(emb, centroids)
    val resid = Pq.ivfResiduals(assigned, centroids)
    val cb = Pq.pqTrain(resid, m = 8, ksub = 16, iters = 1,
      vecCol = "resid")
    Pq.ivfPqWriteIndexFull(Pq.ivfPqEncode(assigned, centroids, cb),
      centroids, cb, semPath)
  }
  def time(tag2: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"SERVE_BAND $tag2 sf=$sfDir rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
  docs.count() // warm
  def serveOnce(): Long = {
    val lex = Retrieval.bm25TopKIndexed(spark, lexPath,
        docs.filter(col("doc_id") < 8), k = 20)
      .select(col("query_id"), col("doc_id").as("neighbor_id"), col("rnk"))
    val sem = Pq.ivfPqTopKFromIndex(spark, semPath,
        emb.filter(col("vec_id") < 8), k = 20, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rnk"))
    Retrieval.rrfFuse(Seq(lex, sem), k = 10).count()
  }
  time("retrieval_serve")(serveOnce())
  time("retrieval_serve_rerun")(serveOnce())
}
System.exit(0)
