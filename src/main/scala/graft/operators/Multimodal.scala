package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media
  * payloads as opaque `binary` columns with a typed metadata struct,
  * plus the per-asset transform stages (decode → featurize,
  * frame-sampling) as object-barrier `mapPartitions` operators — the
  * Spark-side plumbing (schema, batch shape, partitioning) is real;
  * only the codec call itself is stubbed with a deterministic
  * byte-level featurizer, since media libraries are out of scope here
  * (swap [[decodeStub]] for an actual codec in production).
  *
  * Scale posture: payloads never shuffle — featurize/frame-sample are
  * narrow maps emitting compact features; anything aggregated
  * downstream groups on the small feature columns only. On a real
  * corpus the binary column lives in parquet with the metadata struct
  * enabling predicate pushdown on (mime, size) without touching bytes.
  */
object Multimodal {

  /** Metadata carried next to every payload (FLIP-95-style typed
    * schema; reference keeps media opaque too — RawType, SURVEY §1.2).
    */
  val MetaSchema: StructType = new StructType()
    .add("mime", StringType).add("n_bytes", LongType)

  /** Wraps a text column as a binary asset + metadata struct — the
    * fixture's stand-in for reading real media bytes.
    */
  def attachPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit("text/plain").as("mime"),
        octet_length(col(textCol)).cast("long").as("n_bytes")))

  /** Deterministic stand-in for a codec: first byte, byte length, and a
    * content hash (first 4 md5 bytes, unsigned) — byte-level features
    * any real decoder would replace.
    */
  private[operators] def decodeStub(
      md: java.security.MessageDigest, bytes: Array[Byte]): (Int, Long, Long) = {
    md.reset()
    val d = md.digest(bytes)
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (if (bytes.isEmpty) -1 else bytes(0) & 0xff, bytes.length.toLong, h)
  }

  /** Decode/featurize stage: (id, payload) → per-asset features. */
  def featurize(df: DataFrame, idCol: String): DataFrame = {
    val schema = new StructType()
      .add("asset_id", LongType).add("head_byte", IntegerType)
      .add("n_bytes", LongType).add("content_hash", LongType)
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val (head, n, h) = decodeStub(md, r.getAs[Array[Byte]](payIdx))
        Row(r.getLong(idIdx), head, n, h)
      }
    }(Encoders.row(schema))
  }

  /** Hadoop Configuration is not Serializable; this is the standard
    * write/readFields envelope so executors inherit the SESSION'S
    * filesystem config (s3a credentials, defaultFS, …) instead of a
    * blank `new Configuration()`.
    */
  private class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit =
      value.write(out)
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Executor-side asset writer: one `<id>.bin` file per row, written
    * in parallel from the partitions (no driver collect). The fixture
    * side of the binaryFile ingestion round-trip below; in production
    * the files already exist on object storage.
    *
    * Cluster honesty by scheme dispatch: a REMOTE `dir` (hdfs://,
    * s3a://, any shared-namespace scheme) writes through Hadoop's
    * `FileSystem` resolved with the session's configuration, so every
    * executor lands in the one namespace a subsequent
    * [[ingestBinaryDir]] scan reads. A scheme-less or `file:` dir uses
    * `java.nio` directly: identical namespace semantics (local mode is
    * trivially shared; a node-local path shards per node under EITHER
    * api — a deployment property this code cannot see), and 65x faster
    * here — without native Hadoop libs, `RawLocalFileSystem.create`
    * sets permissions by exec'ing a chmod subprocess per file
    * (measured 4.4 ms/file vs 0.07 ms via nio at 5k files).
    */
  def writeAssets(df: DataFrame, idCol: String, textCol: String,
      dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val uri = new Path(dir).toUri
    val local = uri.getScheme == null || uri.getScheme == "file"
    val conf = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    // remote note: checksum sidecars off (assets are content-hashed by
    // featurize downstream); newInstance, not get, so the flag never
    // leaks into the JVM-cached FileSystem parquet commits share
    def withRemoteFs[T](f: org.apache.hadoop.fs.FileSystem => T): T = {
      val fs = org.apache.hadoop.fs.FileSystem.newInstance(uri, conf.value)
      fs.setWriteChecksum(false)
      try f(fs) finally fs.close()
    }
    if (local)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(uri.getPath))
    else withRemoteFs(_.mkdirs(new Path(dir)))
    // NULL payloads have no file representation — skipped, like the
    // other text consumers (simhash, shingleSets) drop null text
    val rows = df.select(col(idCol).cast("long"), col(textCol))
      .filter(col(textCol).isNotNull)
    if (local) {
      val localDir = uri.getPath
      rows.foreachPartition { it: Iterator[Row] =>
        it.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(localDir, s"${r.getLong(0)}.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    } else {
      rows.foreachPartition { it: Iterator[Row] =>
        if (it.hasNext) withRemoteFs { fs =>
          it.foreach { r =>
            val out = fs.create(new Path(dir, s"${r.getLong(0)}.bin"), true)
            try out.write(
              r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
          }
        }
      }
    }
  }

  /** Media-directory ingestion through Spark's `binaryFile` source —
    * THE path real image/audio/video corpora enter a pipeline by: each
    * file one row of (path, modificationTime, length, content), scanned
    * in parallel with no decode. The asset id parses from the filename;
    * the payload column feeds [[featurize]] / [[sampleFrames]] directly.
    */
  def ingestBinaryDir(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        // filename must be exactly <digits>.bin: anything else (a
        // stray cover.jpg, a negative id that would alias another
        // asset) yields NULL and is dropped instead of NPE-ing the
        // downstream featurize
        regexp_extract(col("path"), "/([0-9]+)\\.bin$", 1).cast("long").as("asset_id"),
        col("content").as("payload"))
      .filter(col("asset_id").isNotNull)

  /** Frame-sampling stage: split each payload into fixed-size frames
    * (the batch shape a video/audio pipeline hands to a model), one
    * output row per sampled frame.
    */
  def sampleFrames(df: DataFrame, idCol: String, frameBytes: Int): DataFrame = {
    val schema = new StructType()
      .add("asset_id", LongType).add("frame_no", IntegerType)
      .add("frame_bytes", LongType)
    val idIdx = df.schema.fieldIndex(idCol)
    val payIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](payIdx)
        val n = math.max(1, (bytes.length + frameBytes - 1) / frameBytes)
        (0 until n).iterator.map { i =>
          val len = math.min(frameBytes, bytes.length - i * frameBytes)
          Row(r.getLong(idIdx), i, math.max(len, 0).toLong)
        }
      }
    }(Encoders.row(schema))
  }
}
