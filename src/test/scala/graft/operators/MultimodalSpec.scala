package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q194 at the engine level: the binary-asset member of the
  * incremental-dedup index family, hand-case end to end — materialized
  * `.bin` files, the `binaryFile` re-ingest, the md5-sharded written
  * index, and the shard-pruned incremental probe.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // the near-dup path assigns via the native vec_nearest expression;
  // register regardless of which suite ran first
  graft.functions.VectorExpressions.ensureRegistered(spark)

  test("asset round-trip: writeAssets + ingestBinaryDir recover ids and exact bytes; strays dropped") {
    val docs = Seq((1L, "alpha"), (2L, "beta"), (7L, "alpha"))
      .toDF("doc_id", "text")
    val dir = TmpWorkspaces.pidScoped("graft_mm_spec_", "rt")
    Multimodal.writeAssets(docs, "doc_id", "text", dir.toString)
    // a stray non-asset file in the directory must be dropped, not NPE
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir.toString, "cover.jpg"),
      "junk".getBytes("UTF-8"))
    val got = Multimodal.ingestBinaryDir(spark, dir.toString)
      .select($"asset_id", $"payload".cast("string"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "alpha", 2L -> "beta", 7L -> "alpha"),
      s"got $got")
  }

  test("asset dedup vs the written index: hand clusters, shard-pruned probe, audit catches a replay") {
    // Base assets 1 ("alpha") and 2 ("beta") build the index; the
    // snapshot appends 7 (byte-dup of 1), 8 ("beta" dup of 2), and 9
    // (fresh). Probe verdicts hand-derived: alpha's cluster kept at
    // the GLOBAL min id 1 with size 2, beta's at 2 with size 2, the
    // fresh payload is its own singleton.
    val dir = TmpWorkspaces.pidScoped("graft_mm_spec_", "idx_assets")
    Multimodal.writeAssets(
      Seq((1L, "alpha"), (2L, "beta"), (7L, "alpha"), (8L, "beta"),
        (9L, "gamma")).toDF("doc_id", "text"),
      "doc_id", "text", dir.toString)
    val assets = Multimodal.ingestBinaryDir(spark, dir.toString)
      .localCheckpoint()
    val idx = TmpWorkspaces.pidScoped("graft_mm_spec_", "idx")
    Multimodal.assetWriteIndex(assets.filter($"asset_id" <= 2),
      idx.toString)
    val snapshot = assets.filter($"asset_id" > 2)
    Multimodal.assetAppendIndex(snapshot, idx.toString)
    assert(Multimodal.assetAuditIndex(spark, idx.toString).isEmpty,
      "a clean build+append must audit clean")

    def md5Of(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = Multimodal.assetDedupIndexed(spark, idx.toString, snapshot)
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      (md5Of("alpha"), 1L, 2L),
      (md5Of("beta"), 2L, 2L),
      (md5Of("gamma"), 9L, 1L)), s"got $got")

    // the index layout is the q160 contract: fingerprint-sharded dirs
    val shards = spark.read.parquet(s"$idx/fingerprints")
      .select($"shard", substring($"fingerprint", 1, 2).as("want"))
      .as[(String, String)].collect()
    assert(shards.nonEmpty && shards.forall(s => s._1 == s._2),
      "shard key must be the fingerprint's first 2 hex chars")

    // a replayed append is exactly what the audit localizes
    Multimodal.assetAppendIndex(snapshot, idx.toString)
    val dups = Multimodal.assetAuditIndex(spark, idx.toString)
      .as[(Long, Long, Long)].collect().toSet
    assert(dups == Set((7L, 2L, 1L), (8L, 2L, 1L), (9L, 2L, 1L)),
      s"replay damage must be 2 bit-identical copies per snapshot id: $dups")

    // ...which compaction repairs: audit clean, serve equals the
    // pre-damage verdicts, and the rewrite touched no payload bytes
    // (it reads only the fingerprint rows)
    val repaired = TmpWorkspaces.pidScoped("graft_mm_spec_", "repaired")
    Multimodal.assetCompactIndex(spark, idx.toString, repaired.toString)
    assert(Multimodal.assetAuditIndex(spark, repaired.toString).isEmpty,
      "compaction must clear the audit")
    val served = Multimodal.assetDedupIndexed(spark, repaired.toString,
        snapshot)
      .as[(String, Long, Long)].collect().toSet
    assert(served == got, "the repaired index must serve the clean verdicts")

    // payload divergence — the same id re-ingested with DIFFERENT
    // bytes — must refuse compaction, not silently pick a copy
    Multimodal.assetAppendIndex(
      snapshot.withColumn("payload",
        concat($"payload", lit("corrupted".getBytes("UTF-8")))),
      idx.toString)
    val e = intercept[IllegalArgumentException] {
      Multimodal.assetCompactIndex(spark, idx.toString,
        TmpWorkspaces.pidScoped("graft_mm_spec_", "refuse").toString)
    }
    assert(e.getMessage.contains("payload-divergent"))
  }

  test("frame fingerprints + indexed frame dedup: hand geometry, keep-first on coordinates") {
    def b(s: String) = s.getBytes("UTF-8")
    // frameBytes = 4: asset 1 = "aaaabbbb" -> frames [aaaa, bbbb];
    // asset 2 = "bbbbcccc" -> [bbbb, cccc]; asset 3 = "" -> one empty
    // frame; asset 11 (snapshot) = "ccccaaaa" -> [cccc, aaaa] (both
    // seen before); asset 13 (snapshot) = "dddd" -> [dddd] (novel)
    val base = Seq((1L, b("aaaabbbb")), (2L, b("bbbbcccc")), (3L, b("")))
      .toDF("asset_id", "payload")
    val snap = Seq((11L, b("ccccaaaa")), (13L, b("dddd")))
      .toDF("asset_id", "payload")

    // the fingerprint pass itself: hand md5 + frame geometry
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fps = Multimodal.frameFingerprints(base, "asset_id", 4)
      .as[(Long, Long, String)].collect().toSet
    assert(fps == Set(
      (1L, 0L, md5("aaaa")), (1L, 1L, md5("bbbb")),
      (2L, 0L, md5("bbbb")), (2L, 1L, md5("cccc")),
      (3L, 0L, md5(""))), s"got $fps")

    val idx = TmpWorkspaces.pidScoped("graft_mm_spec_", "frames")
    Multimodal.frameWriteIndex(base, idx.toString, frameBytes = 4)
    Multimodal.frameAppendIndex(snap, idx.toString, frameBytes = 4)
    val got = Multimodal.frameDedupIndexed(spark, idx.toString, snap,
        frameBytes = 4)
      .as[(Long, Long, Long)].collect().toSet
    // 11's cccc lost to (2,1), its aaaa lost to (1,0) -> 0 kept of 2;
    // 13's dddd is globally first -> 1 kept of 1
    assert(got == Set((11L, 2L, 0L), (13L, 1L, 1L)), s"got $got")
  }

  test("featurizeVector: hand-counted byte statistics, bias first") {
    val feats = Multimodal.featurizeVector(
        Multimodal.attachPayload(
          Seq((1L, "tea time "), (2L, "")).toDF("doc_id", "text"), "text"),
        "doc_id")
      .as[(Long, Seq[Double])].collect().toMap
    // "tea time ": 9 bytes, 2 spaces, 2 e, 2 t, 1 a, 0 o, 1 i
    assert(feats(1L) == Seq(1.0, 9, 2, 2, 2, 1, 0, 1), s"got ${feats(1L)}")
    // empty payload: the bias keeps the vector off the zero point
    assert(feats(2L) == Seq(1.0, 0, 0, 0, 0, 0, 0, 0), s"got ${feats(2L)}")
  }

  test("asset near-dup vs the written semantic index: hand geometry end to end") {
    // q197 at the engine level. Feature space is exact-integer, so
    // every verdict is hand-derivable:
    //   "aaaa" -> [1,4,0,0,0,4,0,0]   "iiii" -> [1,4,0,0,0,0,0,4]
    //   "iiio" -> [1,4,0,0,0,0,1,3]: cid 1 (d2 = 2 vs 26), and
    //   cos to "iiii" = 29/sqrt(27*33) ~ 0.9716 < 0.999 -> kept
    // Snapshot dups of base texts sit at cosine exactly 1 -> dropped.
    import graft.operators.Clustering
    val docs = Seq((0L, "aaaa"), (1L, "iiii"), (2L, "aaaa"),
      (3L, "aaaa"), (4L, "iiio"), (5L, "iiii")).toDF("doc_id", "text")
    val feats = Multimodal.featurizeVector(
      Multimodal.attachPayload(docs, "text"), "doc_id").localCheckpoint()
    val cents = feats.filter($"vec_id" < 2)
      .select($"vec_id".as("cid"), $"embedding".as("centroid"))
    val idx = TmpWorkspaces.pidScoped("graft_mm_spec_", "sem")
    Clustering.semanticWriteIndex(
      Clustering.assignL2(feats.filter($"vec_id" <= 2), cents),
      idx.toString)
    val snap = Clustering.assignL2(feats.filter($"vec_id" > 2), cents)
      .localCheckpoint()
    Clustering.semanticAppendIndex(snap, idx.toString, gen = 1)
    val got = Clustering.semDedupIndexed(spark, idx.toString, snap,
        threshold = 0.999)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((0L, 3L, false), (1L, 4L, true), (1L, 5L, false)),
      s"got $got")
  }
}
