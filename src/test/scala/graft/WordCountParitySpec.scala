package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.WordCount

/** Golden parity with the reference's word count (reference `src/app/wc.rs`)
  * over the 6-book Gutenberg corpus at /root/reference/src/data.
  *
  * The independent model below re-derives the semantics character-by-
  * character (NOT via the same regex the implementation uses): Rust's
  * `[^\w\s]` strips every char that is neither Unicode word-char nor
  * whitespace; `split_whitespace` then tokenizes. For this Latin-script
  * corpus, word-char == letter | digit | underscore.
  *
  * Intentional divergence from the reference (SURVEY.md §2 O8): the
  * reference loses the lexicographically-last group of each reduce
  * partition (`src/mr/worker.rs:169-184` never flushes the final group).
  * We produce the complete, correct counts.
  */
class WordCountParitySpec extends AnyFunSuite {
  private val corpusDir = "/root/reference/src/data"

  private def modelCounts(): Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    for (i <- 0 to 5) {
      val text = new String(
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$corpusDir/gut-$i.txt")),
        java.nio.charset.StandardCharsets.UTF_8)
      val sb = new StringBuilder
      def flush(): Unit = {
        if (sb.nonEmpty) { val w = sb.toString; counts(w) = counts.getOrElse(w, 0L) + 1; sb.clear() }
      }
      def isWordChar(ch: Char): Boolean = {
        // Unicode \w in both Rust regex and Java (?U): letters, digits,
        // marks (combining), connector punctuation, join control.
        val t = Character.getType(ch)
        Character.isLetterOrDigit(ch) || ch == '_' ||
          t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
          t == Character.ENCLOSING_MARK || t == Character.CONNECTOR_PUNCTUATION ||
          ch == '‌' || ch == '‍'
      }
      text.foreach { ch =>
        if (isWordChar(ch)) sb.append(ch)
        else if (Character.isWhitespace(ch)) flush()
        // else: punctuation — stripped, does NOT break the token
        // (reference strips first, splits second: "Alice’s" -> "Alices")
      }
      flush()
    }
    counts.toMap
  }

  test("word count over gut corpus matches independent char-level model") {
    val spark = SparkTestSession.spark
    val got = WordCount.overTextFiles(spark, corpusDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = modelCounts()
    val onlyGot = got.keySet -- want.keySet
    val onlyWant = want.keySet -- got.keySet
    assert(onlyGot.isEmpty && onlyWant.isEmpty,
      s"token sets differ: onlyGot=${onlyGot.take(5)} onlyWant=${onlyWant.take(5)}")
    val diff = want.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(diff.isEmpty, s"count mismatches: ${diff.take(5)}")
  }

  test("unicode fidelity: curly apostrophes stripped mid-token, accents kept, case preserved") {
    val spark = SparkTestSession.spark
    val got = WordCount.overTextFiles(spark, corpusDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // “Alice’s” appears in gut-2 (Alice in Wonderland) → token "Alices"
    assert(got.contains("Alices"), "curly apostrophe must be stripped, not split")
    // accented words survive (Rust \w is unicode; Java needs (?U))
    assert(got.keys.exists(w => w.exists(c => "éèàâêáā".contains(c))),
      "accented tokens must survive the (?U) punctuation strip")
    // no case folding: both The and the exist
    assert(got.contains("The") && got.contains("the"))
    // no token contains whitespace or stripped punctuation
    assert(!got.keys.exists(w => w.exists(c => Character.isWhitespace(c) || c == '’')))
  }
}
