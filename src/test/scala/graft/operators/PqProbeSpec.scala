package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TEMPORARY probe (deleted before commit): measures the gap between
  * the exact top-1 similarity and the exact similarity of the PQ-ADC
  * top-1 pick on the real fixtures, to choose the q136 tolerance.
  */
class PqProbeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("probe pq recall gap per sf") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.load(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val cb = Pq.pqTrain(emb, m = 32, ksub = 64, iters = 2)
      val enc = Pq.pqEncode(emb, cb)
      val pick = Pq.pqTopK(enc, cb, queries, k = 1)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Similarity.bruteForceTopK(emb, queries, k = 1)
        .select(col("query_id"), col("sim").as("exact_sim"))
      val cv = emb.select(col("vec_id").as("neighbor_id"),
          col("embedding").cast("array<double>").as("cv"))
        .withColumn("cn", Similarity.l2norm(col("cv")))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("qv"))
        .withColumn("qn", Similarity.l2norm(col("qv")))
      val gaps = pick.join(cv, "neighbor_id").join(q, "query_id")
        .withColumn("pick_sim",
          Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .join(exact, "query_id")
        .select(col("query_id"), col("exact_sim"), col("pick_sim"),
          (col("exact_sim") - col("pick_sim")).as("gap"))
        .orderBy(col("gap").desc)
        .collect()
      println(s"== $sf  maxgap=${gaps.head.getDouble(3)}")
      gaps.take(4).foreach(r => println(s"   $r"))
    }
  }
}
