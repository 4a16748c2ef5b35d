package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis column builders for LLM-data-pipeline operators
 * (SURVEY.md §2 C9-C12). All pure built-in expressions — codegen'd,
 * no UDFs, distributable at any scale.
 */
object TextFunctions {

  /** Whitespace tokens (empty string → single empty token, like DuckDB's
   * string_split_regex — keeps oracle parity). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** C11: token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles (n consecutive tokens joined with one space). */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /**
   * C9: language ID — ordered stopword/script heuristic. The CASE order is
   * part of the function contract (ties resolve to the first match), which
   * keeps it expressible in any SQL engine for oracle checks.
   */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(padded.rlike(" (der|und|die|nicht|das|ist) "), "de")
      .when(padded.rlike(" (le|la|les|est|dans|une) "), "fr")
      .when(padded.rlike(" (el|los|las|es|una|por) "), "es")
      .when(padded.rlike(" (the|and|is|of|to|in) "), "en")
      .otherwise("unknown")
  }

  /** C10: quality-scoring raw features (exact integer counts). */
  def charCount(text: Column): Column = length(text)
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))
  def upperCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[A-Z]", ""))
  def stopwordCount(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isin("the", "a", "and", "is", "of", "to", "in")))

  /** C12: whole-document fingerprint — md5 over whitespace-normalized
   * lowercase text (stable across engines). */
  def fingerprintMd5(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** C12 (scale path): 64-bit rolling polynomial hash over characters,
   * computed distributively per row with built-in `aggregate`. */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""), lit(0L), (acc, ch) => acc * lit(31L) + ascii(ch).cast(LongType))
}
