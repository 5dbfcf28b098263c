package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text helpers shared by word count, dedup and text-analysis
  * packs. All are built from codegen'd `org.apache.spark.sql.functions`
  * (no Scala UDFs) so they stay inside whole-stage codegen and are portable
  * to the DuckDB oracle SQL.
  */
object TextFunctions {

  /** Reference tokenization, step 1: strip every char that is neither
    * word-char nor whitespace (reference `src/app/wc.rs:7-8`,
    * `Regex::new(r"[^\w\s]")`). Rust `\w` is Unicode-aware, so Java regex
    * needs `(?U)` (`UNICODE_CHARACTER_CLASS`) for the same classes —
    * without it `é`/`à` would be stripped too (SURVEY.md §2 O3).
    */
  def stripPunct(c: Column): Column =
    regexp_replace(c, "(?U)[^\\w\\s]", "")

  /** Reference tokenization, step 2: split on whitespace runs with no empty
    * tokens (reference `src/app/wc.rs:9-12`, `split_whitespace`).
    * Returns `array<string>` (possibly with one empty string for
    * leading/trailing whitespace — callers filter, as `explode`d queries
    * drop `w <> ''`).
    */
  def whitespaceSplit(c: Column): Column =
    filter(split(c, "(?U)\\s+"), w => length(w) > 0)

  /** Full reference token stream: strip punctuation then whitespace-split.
    * No case folding — `The` and `the` stay distinct keys, as in the
    * reference.
    */
  def tokens(c: Column): Column = whitespaceSplit(stripPunct(c))

  /** Distinct token set (for Jaccard / MinHash over unigram sets). */
  def tokenSet(c: Column): Column = array_distinct(tokens(c))

  /** Word k-shingles: array of the k-grams of the token stream, joined with
    * a single space. Empty array when the doc has fewer than k tokens.
    */
  def wordShingles(c: Column, k: Int): Column = {
    val toks = tokens(c)
    val n = size(toks)
    when(n < k, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), n - k), i =>
        concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }
}
