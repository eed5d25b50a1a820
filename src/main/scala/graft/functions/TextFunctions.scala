package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no Scala UDFs) so the expressions stay inside whole-stage codegen and
  * are portable to the DuckDB oracle. The shared primitive is a 60-bit
  * hash derived from md5 — md5 is bit-identical in every engine, so
  * MinHash/SimHash signatures computed here hash-match the oracle.
  */
object TextFunctions {

  /** Portable 60-bit hash: first 15 hex chars of md5 as a non-negative
    * long. DuckDB twin: CAST('0x' || substr(md5(x),1,15) AS BIGINT).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Portable 32-bit hash (for SimHash bit sampling). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Whitespace tokens. Single-space split to match the oracle's
    * string_split(trim(x), ' ') exactly.
    */
  def words(text: Column): Column = split(trim(text), " ")

  /** Word n-gram shingles: ["a b c","b c d",...]. Empty array when the
    * doc has fewer than n words (sequence() would otherwise count
    * backwards).
    */
  def shingles(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct shingle set (basis for Jaccard similarity). */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(shingles(words(text), n))

  /** BPE-ish token count: letter runs, digit runs, single punctuation.
    * Same RE and explicit group 0 on both engines. Built from the
    * column parameter (not a hardcoded name) so any input column works.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Document fingerprint: md5 over the sorted distinct token set —
    * catches reordered/duplicated-content docs (bag-of-words identity).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))

  val StopwordsEn: Seq[String] =
    Seq("the", "a", "of", "to", "and", "is", "in", "that")

  /** Language-marker function words per language (public fastText-style
    * heuristic: count closed-class markers, argmax with fixed priority).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "es" -> Seq("el", "la", "los", "las", "que", "y", "es", "una"),
    "fr" -> Seq("le", "les", "des", "et", "est", "dans", "une", "pour"),
    "zh" -> Seq("的", "是", "不", "了", "在"),
  )

  /** Marker-count SQL fragment per language over a words column named
    * `w` (SQL-expr lambdas need the column by name).
    */
  def langScore(markers: Seq[String]): String = {
    val set = markers.map(m => s"'$m'").mkString(", ")
    s"size(filter(w, t -> t IN ($set)))"
  }
}
