// Dumps .explain("formatted") for declared queries to plans/<tag>/
// <query>_<suffix>.txt (guide §7.2: read the plan; the judge checks
// plan claims against these files). Run via spark-shell with the
// packaged jar:
//
//   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
//   SPARK_GRAFT_PLANS=q190_winnow_incremental,q219_winnow_small_delta \
//   SPARK_GRAFT_PLANS_DIR=plans/r21 SPARK_GRAFT_PLANS_SUFFIX=before \
//     /opt/spark/bin/spark-shell --master 'local[8]' \
//     --conf spark.sql.shuffle.partitions=8 --driver-memory 8g \
//     --jars target/scala-2.13/flink1111spark_2.13-0.1.0.jar \
//     -I tools/dump_plans.scala < /dev/null
//
// The query function runs first (many queries build a written index and
// return the probe over it), then the returned DataFrame's formatted
// plan — the declared result the oracle gates — is captured.
{
  val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
  val names = sys.env.getOrElse("SPARK_GRAFT_PLANS", "q1_agg").split(",").toSeq
  val dir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r21")
  val suffix = sys.env.getOrElse("SPARK_GRAFT_PLANS_SUFFIX", "before")
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
  val qmap = graft.SparkEntry.queries
  names.foreach { name =>
    try {
      val df = qmap(name)(spark, sfDir)
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        df.explain("formatted")
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/${name}_$suffix.txt"),
        buf.toByteArray)
      println(s"PLAN_DUMPED $name -> $dir/${name}_$suffix.txt")
    } catch {
      case e: Throwable => println(s"PLAN_FAILED $name: $e")
    }
  }
}
System.exit(0)
