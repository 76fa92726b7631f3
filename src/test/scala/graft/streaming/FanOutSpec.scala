package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class FanOutSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fan-out writes every sink from ONE evaluation of the shared prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_fanout")
    val evals = spark.sparkContext.longAccumulator("prefix_evals")

    val in = MemoryStream[Long]
    val prefix = in.toDS()
      .map { v => evals.add(1); (v, v * 2) }
      .toDF("id", "doubled")

    val q = FanOut.start(prefix, s"$dir/ckpt", Seq(
      (b, _) => b.write.mode("append").parquet(s"$dir/sink_a"),
      (b, _) => b.filter($"id" % 2 === 0).write.mode("append")
        .parquet(s"$dir/sink_b")))
    try {
      in.addData(1L to 100L: _*)
      q.processAllAvailable()
      in.addData(101L to 120L: _*)
      q.processAllAvailable()
    } finally q.stop()

    val a = spark.read.parquet(s"$dir/sink_a")
    val b = spark.read.parquet(s"$dir/sink_b")
    assert(a.count() == 120L && b.count() == 60L)
    assert(a.agg(org.apache.spark.sql.functions.sum($"doubled"))
      .head.getLong(0) == (1L to 120L).map(_ * 2).sum)
    // the map ran once per row, not once per sink — the persist gave
    // both sinks the same materialized batch (StatementSet reuse)
    assert(evals.value == 120L, s"prefix evaluated ${evals.value} times")
  }
}
