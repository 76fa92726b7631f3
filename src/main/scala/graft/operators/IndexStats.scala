package graft.operators

import org.apache.spark.sql.SparkSession

/** Layout-level maintenance metrics for the written index family —
  * the numbers an operator watches BETWEEN repairs: every streaming
  * micro-batch / batch append lands one parquet generation, serve-time
  * scans open the union of all generations' files, and compaction's
  * worth IS the file-count drop. These are driver metadata walks (no
  * data read), bounded by the family's ≤256-directory shard fan-out.
  */
object IndexStats {

  /** Counts the non-hidden DATA files under `dir`, recursively — the
    * read-amplification scalar of a written index layout: a serve-time
    * scan of the layout opens exactly these files (hidden `_`/`.`
    * entries — `_SUCCESS`, checksum sidecars, the ingest ledger and
    * staging dirs — are invisible to parquet readers and excluded
    * here too). Generation appends grow it by one file per touched
    * shard; compaction collapses it back to one file per live shard —
    * q205/q206 gate both sides of that equation against oracles that
    * re-derive the expected counts from the data.
    */
  def dataFileCount(spark: SparkSession, dir: String): Long = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var n = 0L
    def walk(p: Path): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          if (st.isDirectory) walk(st.getPath) else n += 1
        }
      }
    if (fs.exists(root)) walk(root)
    n
  }
}
