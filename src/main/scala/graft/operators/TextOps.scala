package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis operator family.
  *
  * Everything here is composed from `org.apache.spark.sql.functions` so the
  * expressions stay inside whole-stage codegen (no UDF boundary), and every
  * primitive has an exact ANSI-SQL twin (see the `*Sql` members) so the
  * DuckDB oracle can reproduce the value bit-for-bit.
  *
  * Hashing design: a shingle/token hash is the first 8 hex chars of md5,
  * read as an unsigned 32-bit integer. md5 is identical everywhere, and
  * the 64-bit arithmetic that follows ((a*h + b) mod P) stays below 2^63
  * so Spark and DuckDB agree exactly.
  */
object TextOps {

  /** Large prime for universal hashing; h < 2^32, a,b < P, P < 2^31 ⇒
    * a*(h mod P) + b < 2^62: no int64 overflow on either engine.
    */
  val HashP: Long = 1000000007L

  /** Deterministic hash-family constants (fixed seed, public formula:
    * splitmix-style constants folded mod P; stability matters, not quality).
    */
  def hashParams(n: Int): Seq[(Long, Long)] =
    (1 to n).map { i =>
      val a = (2862933555777941757L * i + 3037000493L) % (HashP - 1) + 1
      val b = (4294967291L * i + 1442695040888963407L % HashP) % HashP
      (math.abs(a), math.abs(b))
    }

  /** Lowercase, strip non-alphanumerics (keep spaces), collapse whitespace. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  def normalizeSql(text: String): String =
    s"trim(regexp_replace(regexp_replace(lower($text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  def tokensSql(text: String): String =
    s"string_split(${normalizeSql(text)}, ' ')"

  /** Word n-gram shingles as space-joined strings; empty array when the
    * document has fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array())
  }

  /** DuckDB twin of [[shingles]]: expects `toks` list column in scope. */
  def shinglesSql(toks: String, n: Int): String = {
    val parts = (0 until n).map(k => s"$toks[i + $k]").mkString(" || ' ' || ")
    s"""CASE WHEN len($toks) >= $n
        THEN [ $parts for i in generate_series(1, len($toks) - ${n - 1}) ]
        ELSE [] END"""
  }

  /** First 8 md5 hex chars as an unsigned 32-bit value in a BIGINT. */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  def hash32Sql(s: String): String =
    s"CAST(concat('0x', substr(md5($s), 1, 8)) AS BIGINT)"

  /** i-th universal hash of a 32-bit value: (a_i*(h mod P) + b_i) mod P. */
  def universalHash(h: Column, a: Long, b: Long): Column =
    (lit(a) * (h % HashP) + lit(b)) % HashP

  def universalHashSql(h: String, a: Long, b: Long): String =
    s"(($a * ($h % $HashP) + $b) % $HashP)"
}
