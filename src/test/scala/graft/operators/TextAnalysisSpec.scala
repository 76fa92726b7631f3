package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("bigramNll: hand-computed add-one smoothing, bigram-position vocab, sub-2-token docs absent") {
    val docs = Seq(1L -> "a b a b", 2L -> "a b", 3L -> "c")
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramNll(docs, "doc_id", "text", nllThreshold = 0.25)
      .as[(Long, Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    // cb(a,b)=3, cb(b,a)=1; cl(a)=3, cl(b)=1; V={a,b}=2 ("c" never
    // enters a bigram position). lpf(a,b)=floor(ln(4/5)*1e6)=-223144,
    // lpf(b,a)=floor(ln(2/3)*1e6)=-405466.
    // doc1: -(2*-223144 + -405466)/3e6; doc2: 223144/1e6; doc3 absent.
    assert(got == Seq(
      (1L, 3L, 0.283918, false),
      (2L, 1L, 0.223144, true)))
  }

  test("q150's shipped median cutoff keeps both classes populated on the fixture") {
    // BigramNllMedian (PipelineQueries) is a fixture-derived constant;
    // gates stay green under ANY shared constant, so this is the
    // tripwire for silent drift after a fixture regeneration — see
    // tools/derive_q150_median.py for the derivation.
    val kept = graft.SparkEntry.queries("q150_bigram_quality")(spark, sf)
      .groupBy("kept").count().as[(Boolean, Long)].collect().toMap
    assert(kept.getOrElse(true, 0L) > 0, "no docs kept at the shipped cutoff")
    assert(kept.getOrElse(false, 0L) > 0, "no docs dropped at the shipped cutoff")
  }

  test("bigramNllApply: base-trained model scores a disjoint frame; unseen bigrams and contexts smooth at zero counts") {
    val train = Seq(1L -> "a b", 2L -> "a b a").toDF("doc_id", "text")
    val score = Seq(10L -> "b a c", 11L -> "z q", 12L -> "x")
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramNllApply(train, score, "doc_id", "text",
        nllThreshold = 0.8)
      .as[(Long, Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    // model: cb(a,b)=2, cb(b,a)=1; cl(a)=2, cl(b)=1; V={a,b}=2.
    // doc10 (b,a): seen, (1+1)/(1+2) -> floor(ln(2/3)*1e6) = -405466;
    //       (a,c): unseen bigram, seen context, 1/(2+2) -> -1386295;
    //       nll = 1791761/2e6 = 0.895881
    // doc11 (z,q): unseen CONTEXT -> 1/(0+2) -> -693148 -> 0.693148
    // doc12: single token, no bigram — absent
    assert(got == Seq(
      (10L, 2L, 0.895881, false),
      (11L, 1L, 0.693148, true)))
  }

  test("bigramWriteModel/bigramNllFromModel: the written-model path scores identically to in-session apply") {
    val train = Seq(1L -> "a b", 2L -> "a b a").toDF("doc_id", "text")
    val score = Seq(10L -> "b a c", 11L -> "z q").toDF("doc_id", "text")
    val path = TmpWorkspaces.pidScoped("graft_bigram_spec_", "roundtrip")
    TextAnalysis.bigramWriteModel(train, path.toString, "doc_id", "text")
    val inSession = TextAnalysis
      .bigramNllApply(train, score, "doc_id", "text", 0.8)
      .as[(Long, Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    val fromModel = TextAnalysis
      .bigramNllFromModel(spark, path.toString, score, "doc_id", "text", 0.8)
      .as[(Long, Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    assert(fromModel == inSession)
  }

  test("bigramModelAudit: unseen-bigram and unseen-context mass per source, hand-computed") {
    val train = Seq(1L -> "a b", 2L -> "a b a").toDF("doc_id", "text")
    val path = TmpWorkspaces.pidScoped("graft_bigram_spec_", "audit")
    TextAnalysis.bigramWriteModel(train, path.toString, "doc_id", "text")
    // model: cb = {(a,b), (b,a)}; contexts = {a, b}
    val score = Seq(
      (10L, "s1", "b a c"),   // (b,a) seen; (a,c) unseen pair, seen ctx
      (11L, "s1", "z q"),     // (z,q) unseen pair AND unseen ctx
      (12L, "s2", "a b a b")) // (a,b)x2, (b,a): all seen
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.bigramModelAudit(spark, path.toString, score,
        "doc_id", "text", "source")
      .as[(String, Long, Long, Double, Long, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      ("s1", 3L, 2L, 0.666667, 1L, 0.333333),
      ("s2", 3L, 0L, 0.0, 0L, 0.0)))
  }

  test("q165's base-trained cutoff keeps both classes populated on the fixture") {
    // same tripwire as q150's: the shipped constant is calibrated on
    // the SELF-scored corpus; this asserts it still splits the
    // base-model-scores-snapshot distribution, q166's filter premise
    val kept = graft.SparkEntry.queries("q165_bigram_apply")(spark, sf)
      .groupBy("kept").count().as[(Boolean, Long)].collect().toMap
    assert(kept.getOrElse(true, 0L) > 0, "no snapshot docs kept at the cutoff")
    assert(kept.getOrElse(false, 0L) > 0, "no snapshot docs dropped at the cutoff")
  }

  private def metrics(texts: (Long, String)*): Map[Long, (Long, Double, Double)] =
    TextAnalysis.repetitionMetrics(texts.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "n_toks", "dup3_frac", "top_frac")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("repetitionMetrics flags boilerplate and passes varied text") {
    val m = metrics(
      1L -> "spam spam spam spam spam spam",      // one token repeated
      2L -> "one two three four five six",        // all distinct
      3L -> "a b c a b c a b c")                  // repeated 3-gram phrase
    // doc 1: 6 tokens, 4 shingles all "spam spam spam" -> dup3 = 1 - 1/4
    assert(m(1L) == ((6L, 0.75, 1.0)))
    // doc 2: no repetition at all
    assert(m(2L) == ((6L, 0.0, round6(1.0 / 6))))
    // doc 3: 9 tokens, 7 shingles, 3 distinct ("a b c","b c a","c a b")
    assert(m(3L)._2 == round6(1.0 - 3.0 / 7))
    assert(m(3L)._3 == round6(3.0 / 9))
  }

  test("repetitionMetrics survives sub-3-token and empty docs") {
    val m = metrics(10L -> "just two", 11L -> "")
    assert(m(10L) == ((2L, 0.0, 0.5)))
    // empty text normalizes to one empty token, which the top-token
    // pass filters out -> top_frac coalesces to 0
    assert(m(11L)._2 == 0.0 && m(11L)._3 == 0.0)
  }

  test("tfidfTopK: textbook smoothed scores, rank by rounded score then token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "y y x"),   // tf(y)=2 df(y)=1; tf(x)=1 df(x)=3
      (2L, "x z"),     // z: df=1
      (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rk")
      .select("doc_id", "tok", "tf", "df", "tfidf", "rk")
      .as[(Long, String, Long, Long, Double, Long)].collect().toSeq
    val lnYd1 = round6(2.0 * math.log(3.0 / 2.0))   // 0.810930
    val lnZ = round6(math.log(3.0 / 2.0))           // 0.405465
    val lnX = round6(math.log(3.0 / 4.0))           // -0.287682 (ubiquitous)
    assert(out == Seq(
      (1L, "y", 2L, 1L, lnYd1, 1L),
      (1L, "x", 1L, 3L, lnX, 2L),
      (2L, "z", 1L, 1L, lnZ, 1L),
      (2L, "x", 1L, 3L, lnX, 2L),
      (3L, "x", 1L, 3L, lnX, 1L)))
  }

  test("bpePairCounts: hand-counted adjacent char pairs, normalized, tie-broken") {
    // "Ab-ab!" normalizes to "ab ab" -> words [ab, ab] -> pair ab x2;
    // "banana" -> ba, an, na, an, na; "x" has no pair (len 1);
    // expected counts: an 2, na 2, ab 2, ba 1 -> tie-break pair asc
    val docs = Seq(
      (1L, "Ab-ab!"),
      (2L, "banana"),
      (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairCounts(docs, "text", k = 10)
      .orderBy("rk")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("ab", 2L, 1L), ("an", 2L, 2L), ("na", 2L, 3L), ("ba", 1L, 4L)))
  }

  test("qualityPercentileGate: per-stratum cume_dist keep, hand-computed NLL ranks") {
    // corpus: w appears 7 times, z twice, total 9
    //   lpf(w) = floor(ln(7/9)·1e6) = -251315
    //   lpf(z) = floor(ln(2/9)·1e6) = -1504078
    // nll: doc1 "w w" = 0.251315, doc2 "w" = 0.251315,
    //      doc3 "w z" = (251315+1504078)/2e6 = 0.877697 (rounded)
    //      doc4 "w w w" = 0.251315, doc5 "z" = 1.504078
    // source a ranks (nll, doc_id): 1 → 1/3, 2 → 2/3, 3 → 3/3
    // source b: 4 → 1/2, 5 → 2/2; keepFrac 0.5 keeps docs 1 and 4
    val df = Seq(
      (1L, "a", "w w"), (2L, "a", "w"), (3L, "a", "w z"),
      (4L, "b", "w w w"), (5L, "b", "z")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.qualityPercentileGate(df, "doc_id", "text",
        "source", keepFrac = 0.5)
      .as[(String, Long, Long, Double, Double, Boolean)].collect()
      .map(r => r._2 -> r).toMap
    assert(out(1L) == (("a", 1L, 2L, 0.251315, 0.333333, true)), s"got ${out(1L)}")
    assert(out(2L) == (("a", 2L, 1L, 0.251315, 0.666667, false)), s"got ${out(2L)}")
    assert(out(3L) == (("a", 3L, 2L, 0.877697, 1.0, false)), s"got ${out(3L)}")
    assert(out(4L) == (("b", 4L, 3L, 0.251315, 0.5, true)), s"got ${out(4L)}")
    assert(out(5L) == (("b", 5L, 1L, 1.504078, 1.0, false)), s"got ${out(5L)}")
    // keepFrac = 1.0 keeps everything — the adaptive cut never
    // over-cuts a uniformly clean source
    val allKept = TextAnalysis.qualityPercentileGate(df, "doc_id", "text",
      "source", keepFrac = 1.0)
    assert(allKept.filter(!org.apache.spark.sql.functions.col("kept")).isEmpty)
  }

  test("datasetCard: exact median pick, fixed-point quality mean, language mode — by hand") {
    // source a: "the the the" (en, 3 toks, score .612), "the the"
    // (en, 2, .608), "zzzz zzzz zzzz zzzz" (und, 4, .416)
    //   total 9, mean 9 div 3 = 3; median order (n_toks, doc_id) =
    //   doc2(2), doc1(3), doc3(4), mid = 2 → p50 = 3; top lang en ×2;
    //   qsum = 612000+608000+416000 = 1636000 → mean .545333
    // source b: "und und" (de via the de stopword list, 2 toks, .608)
    val df = Seq(
      (1L, "a", "the the the"), (2L, "a", "the the"),
      (3L, "a", "zzzz zzzz zzzz zzzz"), (4L, "b", "und und"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.datasetCard(df, "source", "doc_id", "text")
      .as[(String, Long, Long, Long, Long, String, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 3L, 9L, 3L, 3L, "en", 2L, 0.545333)),
      s"got ${got("a")}")
    assert(got("b") == (("b", 1L, 2L, 2L, 2L, "de", 1L, 0.608)),
      s"got ${got("b")}")
    // even-count source: the pick is the LOWER middle ((n+1) div 2)
    val even = TextAnalysis.datasetCard(
      df.filter(org.apache.spark.sql.functions.col("doc_id") <= 2L),
      "source", "doc_id", "text")
      .as[(String, Long, Long, Long, Long, String, Long, Double)].head()
    assert(even._5 == 2L, s"lower-middle pick expected, got $even")
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
