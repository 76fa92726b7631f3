package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — public; the algorithm GPT-2/LLaMA-family tokenizers build
  * on). Training is rounds of "count all adjacent symbol pairs over
  * the word-frequency table, merge the most frequent everywhere";
  * application replays the learned merges over a corpus and counts the
  * resulting subword tokens — the tokenizer-prep + token-accounting
  * passes a training pipeline runs over its own data.
  *
  * Segmentation encoding: a word's current symbol sequence is a single
  * string — symbols joined by TWO spaces, the whole wrapped in single
  * spaces (`"hello"` → `" h  e  l  l  o "`). Symbols are `[a-z0-9]+`
  * (the repo-wide [[TextOps.normalize]] alphabet), so `" l  r "` can
  * only match symbol boundaries, and a literal left-to-right
  * non-overlapping `replace(seq, " l  r ", " lr ")` implements exactly
  * the greedy leftmost BPE merge — including the `"aaa"` overlap case
  * — because consuming the pair's trailing space leaves the next
  * separator's other space in place. Both engines' `replace` share
  * that contract, so the DuckDB oracle replays training bit-for-bit
  * with no regex (RE2 has no lookarounds) and no UDF.
  *
  * 100 TB posture: the corpus is scanned ONCE (word counts — the same
  * partial-aggregated explode as every text operator); the train loop
  * then runs entirely on the VOCABULARY-sized word-frequency table
  * (localCheckpoint'd, re-checkpointed each merge so lineage stays
  * flat), with one bounded-key pair aggregation and a single-row
  * collect per merge. Application is one narrow corpus pass — the
  * merge chain is N nested literal replaces inside codegen — plus a
  * per-doc sum.
  */
object Bpe {

  /** `"hello"` → `" h  e  l  l  o "` (see the encoding contract above). */
  private def charSeq(word: Column): Column =
    concat(lit(" "),
      array_join(transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))), "  "),
      lit(" "))

  /** DuckDB twin of [[charSeq]]. */
  private def charSeqSql(word: String): String =
    s"' ' || array_to_string([$word[j] for j in generate_series(1, len($word))], '  ') || ' '"

  /** One learned merge: at `step`, symbols (`lft`,`rgt`) — the pair
    * with the highest frequency-weighted count, ties broken by
    * (lft, rgt) — fused everywhere; `cnt` is that winning count.
    */
  final case class Merge(step: Int, lft: String, rgt: String, cnt: Long)

  /** The corpus word-frequency table: (word, cnt), one scan. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol pairs of the current segmentation, weighted by
    * word frequency: (lft, rgt, pc). All adjacent POSITIONS count
    * (`"a a a"` has (a,a) twice), per the reference algorithm.
    */
  private def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(trim(col("seq")), "  ")
    words.select(col("cnt"), syms.as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("lft"),
          element_at(col("syms"), i + 1).as("rgt")))).as("p"))
      .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
      .agg(sum(col("cnt")).as("pc"))
  }

  /** Train `nMerges` BPE merges over the corpus. Returns the merge
    * list in order; stops early if the pair supply dries up. The
    * single-row collect per merge is the algorithm's sequential
    * dependency (merge i+1's counts depend on merge i's rewrite), not
    * an implementation shortcut.
    *
    * PRODUCTION-TRAINER NOTE (the 30k-merge shape): at gate scale
    * (4–6 merges) one full pair-count aggregation + collect per merge
    * is exact-replay-critical and cheap, but a real vocabulary is
    * O(30k) merges and this loop would run 30k Spark jobs over the
    * word table. Production BPE trainers (Sennrich's reference
    * implementation, HuggingFace tokenizers) run the SAME greedy
    * algorithm against a cached pair-count table updated by DELTAS:
    * merging (l,r) only changes counts of pairs overlapping an (l,r)
    * occurrence, so each round applies a sparse delta and re-extracts
    * the max instead of recounting the corpus-vocabulary. The Spark
    * shape of that optimization is a driver-held count map (pair
    * alphabet is vocabulary-bounded) refreshed by a delta aggregation
    * over only the words REWRITTEN this round — same merges, same
    * replay, ~all rounds touching a shrinking fraction of the table.
    * Worth building when a real-vocabulary training run lands; the
    * gate keeps the recount form because its oracle replay is the
    * correctness anchor every other BPE operator leans on.
    */
  def trainMerges(
      df: DataFrame, textCol: String, nMerges: Int): Seq[Merge] =
    trainMergesFromWordFreq(wordFreq(df, textCol), nMerges)

  /** [[trainMerges]] over a PRECOMPUTED (word, cnt) frame — the
    * sharing point when several tokenizer products derive from one
    * corpus scan: q157 materializes ONE `wordFreq` (localCheckpoint)
    * instead of tokenizing the corpus once per derivation (measured:
    * the duplicate pass was most of q157's cost at sf1 — the
    * materialize-once rule applied to the tokenizer).
    */
  def trainMergesFromWordFreq(wf: DataFrame, nMerges: Int): Seq[Merge] = {
    var words = wf
      .select(col("cnt"), charSeq(col("word")).as("seq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var dry = false
    while (step <= nMerges && !dry) {
      val best = pairCounts(words)
        .orderBy(col("pc").desc, col("lft"), col("rgt"))
        .limit(1).collect()
      if (best.isEmpty) dry = true
      else {
        val (l, r, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(step, l, r, pc)
        words = words
          .withColumn("seq", call_function("replace",
            col("seq"), lit(s" $l  $r "), lit(s" $l$r ")))
          .localCheckpoint()
        step += 1
      }
    }
    merges.result()
  }

  /** The learned merges as a (step, lft, rgt, cnt) frame. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("step", "lft", "rgt", "cnt")
      .select(col("step").cast("long"), col("lft"), col("rgt"), col("cnt"))
  }

  /** The learned-merge chain applied to a word column: nested literal
    * replaces under the two-space segmentation encoding (see the
    * object scaladoc) — the shared encode core of
    * [[encodeTokenCounts]] and [[encodeIds]].
    */
  private def mergeChain(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(charSeq(word)) { (s, m) =>
      call_function("replace", s,
        lit(s" ${m.lft}  ${m.rgt} "), lit(s" ${m.lft}${m.rgt} "))
    }

  /** Apply learned merges to a corpus and count the resulting subword
    * tokens per document: (id, n_words, n_bpe). One narrow corpus pass
    * (the merge chain is nested literal replaces) + one keyed sum;
    * zero merges means n_bpe = character count.
    */
  def encodeTokenCounts(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .withColumn("n",
        size(split(trim(mergeChain(col("word"), merges)), "  ")).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n")).as("n_bpe"))

  /** The full base alphabet of the [[TextOps.normalize]] contract, in
    * ascending order: every character normalized text can contain.
    */
  val BaseAlphabet: Seq[String] =
    (('0' to '9') ++ ('a' to 'z')).map(_.toString)

  /** The tokenizer's VOCABULARY with stable ids: the FULL
    * [[BaseAlphabet]] (ids 0..35 — '0'..'9' then 'a'..'z'), then each
    * merge's product symbol in training order — deduped on SURFACE
    * FORM keeping the first occurrence (two merge paths can fuse to
    * the same string, e.g. (a,bc) and (ab,c) → "abc"; a vocabulary
    * maps surface forms to ids, so duplicates collapse exactly as a
    * HuggingFace-style vocab file would). Deterministic given the
    * MERGES ALONE — no corpus scan, no observed-character dependence.
    *
    * Seeding the whole alphabet (rather than the characters the
    * training corpus happened to contain) makes [[encodeIds]] TOTAL
    * over normalized text: any future snapshot's characters are in
    * `[a-z0-9]` by the normalize contract, so an OOV symbol is
    * impossible and a day-2 encode job can never crash deep in an
    * executor on a character the reference corpus lacked.
    */
  def vocab(merges: Seq[Merge]): Seq[(Long, String)] =
    (BaseAlphabet ++ merges.map(m => m.lft + m.rgt)).distinct
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }

  /** A [[vocab]] as a (token_id, sym) frame. */
  def vocabDf(spark: SparkSession, v: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    v.toDF("token_id", "sym")
  }

  /** Apply learned merges to a corpus and emit each document's
    * TOKEN-ID SEQUENCE — the artifact a pretraining run consumes:
    * (id, n_tokens, token_ids ARRAY<LONG>), ids per [[vocab]],
    * symbols in document order (words in order, subwords
    * left-to-right within each word). Documents with NULL text or
    * normalizing to zero tokens emit an empty array.
    *
    * One NARROW corpus pass, zero shuffles, inside a single typed
    * `mapPartitions` — the [[Dedup]] shingle-set precedent: the first
    * cut expressed the merge chain + vocab lookup as nested
    * higher-order functions, which evaluate INTERPRETED and measured
    * ~20× slower than this fused JVM loop (14.8 s for 40 sf1
    * documents — the per-word nested-lambda tree, re-evaluated per
    * derived column, dominated the query). Engine equality holds
    * because every piece has a proven JVM twin: [[TextOps
    * .normalizeStr]] tokenization, `String.replace`'s left-to-right
    * non-overlapping contract (the same one DuckDB's `replace` and
    * Spark's `StringReplace` share — the object scaladoc's encoding
    * argument), and the first-wins vocab map ([[vocab]] dedups
    * surface forms before this sees them).
    */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge], v: Seq[(Long, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mergeStrs = merges
      .map(m => (s" ${m.lft}  ${m.rgt} ", s" ${m.lft}${m.rgt} ")).toArray
    val idBySym = v.map { case (i, s) => s -> i }.toMap
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val toks = TextOps.normalizeStr(if (text == null) "" else text)
            .split(" ").filter(_.nonEmpty)
          val ids = Array.newBuilder[Long]
          val sb = new java.lang.StringBuilder
          var wi = 0
          while (wi < toks.length) {
            sb.setLength(0)
            sb.append(' ')
            val w = toks(wi)
            var ci = 0
            while (ci < w.length) {
              if (ci > 0) sb.append("  ")
              sb.append(w.charAt(ci))
              ci += 1
            }
            sb.append(' ')
            var seq = sb.toString
            var mi = 0
            while (mi < mergeStrs.length) {
              seq = seq.replace(mergeStrs(mi)._1, mergeStrs(mi)._2)
              mi += 1
            }
            val syms = seq.trim.split("  ")
            var si = 0
            while (si < syms.length) {
              // total by construction: single chars are alphabet-seeded
              // and multi-char symbols only arise from merges, which
              // vocab() contains — the getOrElse is a loud backstop
              // against a vocab/merges pair from DIFFERENT tokenizers
              val sym = syms(si)
              ids += idBySym.getOrElse(sym, throw new IllegalArgumentException(
                s"encodeIds: symbol '$sym' (doc $id) is not in the " +
                  "vocabulary — the merges and vocab are from different " +
                  "tokenizers (vocab() seeds the full alphabet and every " +
                  "merge product, so a consistent pair cannot miss)"))
              si += 1
            }
            wi += 1
          }
          val out = ids.result()
          (id, out.length.toLong, out.toSeq)
        }
      }
      .toDF(idCol, "n_tokens", "token_ids")
  }

  /** Writes a trained tokenizer as a WRITTEN, self-contained artifact —
    * the tokenizer's entry in the written-index family (IVF-PQ q141,
    * BM25 q154): `merges/` = (step, lft, rgt, cnt) in training order
    * and `vocab/` = (token_id, sym) per [[vocab]]'s contract. A
    * standing pipeline trains the tokenizer ONCE on its reference
    * corpus and encodes every future snapshot from this artifact —
    * training never reruns on the ingest path. Both tables are
    * vocabulary-sized (≤ 36 base symbols + one row per merge), so the
    * artifact is KB-scale whatever the corpus: one coalesced file
    * each.
    */
  def writeTokenizer(spark: SparkSession, path: String,
      merges: Seq[Merge], v: Seq[(Long, String)]): Unit = {
    mergesDf(spark, merges)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    vocabDf(spark, v)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Loads a [[writeTokenizer]] artifact back into driver literals.
    * The collects are bounded BY THE ARTIFACT'S CONSTRUCTION
    * (vocabulary-sized, not corpus-sized); the caps below are loud
    * backstops against pointing this at something that is not a
    * tokenizer artifact. Merge order is the persisted `step` — the
    * chain replays exactly as trained.
    */
  def loadTokenizer(spark: SparkSession,
      path: String): (Seq[Merge], Seq[(Long, String)]) = {
    val mRows = spark.read.parquet(s"$path/merges")
      .orderBy(col("step")).collect()
    require(mRows.length <= 100000,
      s"loadTokenizer: ${mRows.length} merges exceed the 100k cap — " +
        s"$path/merges is not a plausible tokenizer artifact")
    val merges = mRows.map(r => Merge(r.getLong(0).toInt,
      r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val vRows = spark.read.parquet(s"$path/vocab")
      .orderBy(col("token_id")).collect()
    require(vRows.length <= 36 + merges.length,
      s"loadTokenizer: ${vRows.length} vocab rows exceed the base-alphabet" +
        s" + merges bound (${36 + merges.length}) — $path/vocab is damaged")
    (merges, vRows.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  /** [[encodeIds]] from a WRITTEN tokenizer: load the artifact, encode
    * the frame — the day-2 ingest path. One artifact read (two
    * KB-scale files) + the same single narrow corpus pass; q164 gates
    * it hash-equal to the in-session train+encode oracle.
    */
  def encodeIdsFromTokenizer(spark: SparkSession, path: String,
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (merges, v) = loadTokenizer(spark, path)
    encodeIds(df, idCol, textCol, merges, v)
  }

  /** [[encodeTokenCounts]] from a WRITTEN tokenizer (see
    * [[encodeIdsFromTokenizer]]) — the counts-only day-2 path the
    * packing composition rides (token budgets need n_bpe, not the id
    * arrays).
    */
  def encodeTokenCountsFromTokenizer(spark: SparkSession, path: String,
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (merges, _) = loadTokenizer(spark, path)
    encodeTokenCounts(df, idCol, textCol, merges)
  }

  // ------------------------------------------------------------------
  // DuckDB oracle builders: unrolled training replay
  // ------------------------------------------------------------------

  /** CTE chain replaying [[trainMerges]]: `wc` (word counts), `w0`
    * (initial segmentations), then per merge i: `c{i}` (pair counts),
    * `b{i}` (the winner), `w{i}` (the rewrite). Callers append a tail
    * over `b1..bN` ([[trainOracleTailSql]]) or over `wN`/the merge
    * scalars ([[encodeOracleSql]]).
    */
  def trainOracleCtes(table: String, textCol: String, nMerges: Int): String = {
    val base = s"""
      wc AS (SELECT word, COUNT(*) AS cnt
             FROM (SELECT unnest(${TextOps.tokensSql(textCol)}) AS word
                   FROM $table) t
             WHERE word <> '' GROUP BY 1),
      w0 AS (SELECT cnt, ${charSeqSql("word")} AS seq FROM wc)"""
    val steps = (1 to nMerges).map { i =>
      s"""
      c$i AS (SELECT syms[j] AS lft, syms[j + 1] AS rgt, SUM(cnt) AS pc
              FROM (SELECT cnt, syms,
                           unnest(generate_series(1, len(syms) - 1)) AS j
                    FROM (SELECT cnt, string_split(trim(seq), '  ') AS syms
                          FROM w${i - 1})
                    WHERE len(syms) >= 2) t
              GROUP BY 1, 2),
      b$i AS (SELECT lft, rgt, CAST(pc AS BIGINT) AS pc FROM c$i
              ORDER BY pc DESC, lft, rgt LIMIT 1),
      w$i AS (SELECT cnt, replace(seq, ' ' || b.lft || '  ' || b.rgt || ' ',
                                  ' ' || b.lft || b.rgt || ' ') AS seq
              FROM w${i - 1} CROSS JOIN b$i b)"""
    }
    (base +: steps).mkString(",")
  }

  /** Tail over [[trainOracleCtes]]: the ordered merge table. */
  def trainOracleTailSql(nMerges: Int): String = {
    val rows = (1 to nMerges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, lft, rgt, pc AS cnt FROM b$i")
    s"""
      SELECT step, lft, rgt, cnt
      FROM (${rows.mkString("\n      UNION ALL ")})
      ORDER BY step"""
  }

  /** Encode replay as a WITH-clause body appended AFTER
    * [[trainOracleCtes]] (the `b{i}` winners must be in scope):
    * defines `enc` = (idCol, n_words, n_bpe) — per-document counts
    * with the merge chain applied as nested replaces, each merge's
    * strings from its `b{i}` scalar subqueries (exactly the literals
    * the Spark side embeds after its collects).
    *
    * Early-dry guard: if training dries up before `nMerges` (the pair
    * supply exhausts), the Spark side folds only the merges actually
    * learned — but an empty `b{i}` makes its scalar subqueries NULL,
    * and `replace(seq, NULL, NULL)` would NULL every count. Each
    * step's args therefore COALESCE to `'~'` — outside the
    * `[a-z0-9 ]` segmentation alphabet, so the replace is a no-op,
    * exactly matching the Spark side's shorter fold.
    */
  /** The merge chain as nested replaces over a `word` SQL expression,
    * each step's strings from its `b{i}` scalar subqueries (exactly
    * the literals the Spark side embeds after its collects) — shared
    * by [[encodeOracleCtes]] and [[encodeIdsOracleCtes]]. See
    * [[encodeOracleCtes]] for the early-dry COALESCE guard.
    */
  private def mergeChainSql(word: String, nMerges: Int): String =
    (1 to nMerges).foldLeft(charSeqSql(word)) { (s, i) =>
      s"""replace($s, COALESCE((SELECT ' ' || lft || '  ' || rgt || ' ' FROM b$i), '~'),
                  COALESCE((SELECT ' ' || lft || rgt || ' ' FROM b$i), '~'))"""
    }

  def encodeOracleCtes(
      table: String, idCol: String, textCol: String, nMerges: Int): String =
    s"""
      tok AS (SELECT $idCol, unnest(${TextOps.tokensSql(textCol)}) AS word
              FROM $table),
      encn AS (SELECT $idCol,
                      CAST(len(string_split(trim(${mergeChainSql("word", nMerges)}), '  ')) AS BIGINT) AS n
               FROM tok WHERE word <> ''),
      enc AS (SELECT $idCol, CAST(COUNT(*) AS BIGINT) AS n_words,
                     CAST(SUM(n) AS BIGINT) AS n_bpe
              FROM encn GROUP BY $idCol)"""

  /** Vocabulary replay as a WITH-clause body appended AFTER
    * [[trainOracleCtes]] (the `b{i}` winners must be in scope):
    * defines `vocab` = (sym, token_id) — the full 36-char base
    * alphabet ('0'..'9' then 'a'..'z'), then merge products in
    * training order, surface-form-deduped keeping the first, ids
    * renumbered densely — exactly [[Bpe.vocab]]'s contract.
    */
  def vocabOracleCtes(nMerges: Int): String = {
    val mergeRows = (1 to nMerges).map(i =>
      s"SELECT lft || rgt AS sym, 1 AS grp, '' AS bord, $i AS mstep FROM b$i")
    s"""
      bchars AS (SELECT chr(CAST(c AS INTEGER)) AS sym
                 FROM (SELECT unnest(generate_series(48, 57)) AS c
                       UNION ALL
                       SELECT unnest(generate_series(97, 122))) t),
      vsyms AS (SELECT sym, 0 AS grp, sym AS bord, 0 AS mstep FROM bchars
                ${mergeRows.map("UNION ALL " + _).mkString("\n                ")}),
      vord AS (SELECT sym, ROW_NUMBER() OVER (ORDER BY grp, bord, mstep) AS rn
               FROM vsyms),
      vocab AS (SELECT sym, ROW_NUMBER() OVER (ORDER BY rn) - 1 AS token_id
                FROM (SELECT sym, rn,
                             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY rn) AS dup
                      FROM vord) d
                WHERE dup = 1)"""
  }

  /** Token-ID-sequence replay as a WITH-clause body appended AFTER
    * [[trainOracleCtes]] + [[vocabOracleCtes]]: defines `ids` =
    * (idCol, pos, token_id) — every subword symbol in document order
    * (word position, then symbol position within the word; `pos` is
    * the dense 0-based rank over that order) joined to its vocabulary
    * id. The row form of [[Bpe.encodeIds]]'s arrays.
    */
  def encodeIdsOracleCtes(
      table: String, idCol: String, textCol: String, nMerges: Int): String =
    s"""
      itok AS (SELECT $idCol, ${TextOps.tokensSql(textCol)} AS toks
               FROM $table),
      itokp AS (SELECT $idCol, wpos, toks[wpos] AS word
                FROM (SELECT $idCol, toks,
                             unnest(generate_series(1, len(toks))) AS wpos
                      FROM itok) t),
      isymp AS (SELECT $idCol, wpos, spos, syms[spos] AS sym
                FROM (SELECT $idCol, wpos, syms,
                             unnest(generate_series(1, len(syms))) AS spos
                      FROM (SELECT $idCol, wpos,
                                   string_split(trim(${mergeChainSql("word", nMerges)}), '  ') AS syms
                            FROM itokp WHERE word <> '') s) u),
      ids AS (SELECT i.$idCol,
                     ROW_NUMBER() OVER (PARTITION BY i.$idCol
                       ORDER BY i.wpos, i.spos) - 1 AS pos,
                     v.token_id
              FROM isymp i JOIN vocab v ON i.sym = v.sym)"""

  /** Full encode replay: train CTEs + [[encodeOracleCtes]] (q149). */
  def encodeOracleSql(
      table: String, idCol: String, textCol: String, nMerges: Int): String =
    s"""
      WITH ${trainOracleCtes(table, textCol, nMerges)},
      ${encodeOracleCtes(table, idCol, textCol, nMerges)}
      SELECT $idCol, n_words, n_bpe
      FROM enc
      ORDER BY $idCol"""
}
