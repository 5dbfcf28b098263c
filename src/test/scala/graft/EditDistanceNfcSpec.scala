package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExpressions

/** Model-checks the native full Damerau–Levenshtein kernel against an
  * INDEPENDENT ground truth — breadth-first search over the actual edit
  * system (insert / delete / substitute / adjacent transposition, unit
  * cost) — so the Lowrance–Wagner DP is validated against the metric's
  * definition, not against a re-implementation of itself. Also pins the
  * unrestricted-vs-OSA distinction ("CA"→"ABC" is 2, not 3) and the NFC
  * normalizer's compose/idempotence/identity behavior.
  */
class EditDistanceNfcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** BFS edit-system distance: minimal op count turning a into b. */
  private def bfsDistance(a: String, b: String): Int = {
    if (a == b) return 0
    val alphabet = (a + b).toSet.toSeq
    val maxLen = math.max(a.length, b.length) + 2
    val seen = scala.collection.mutable.HashSet[String](a)
    var frontier = List(a)
    var dist = 0
    while (true) {
      dist += 1
      val next = scala.collection.mutable.ListBuffer[String]()
      for (s <- frontier) {
        val cands = scala.collection.mutable.ListBuffer[String]()
        for (i <- 0 until s.length) cands += s.substring(0, i) + s.substring(i + 1)
        if (s.length < maxLen)
          for (i <- 0 to s.length; c <- alphabet)
            cands += s.substring(0, i) + c + s.substring(i)
        for (i <- 0 until s.length; c <- alphabet if s(i) != c)
          cands += s.substring(0, i) + c + s.substring(i + 1)
        for (i <- 0 until s.length - 1 if s(i) != s(i + 1))
          cands += s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2)
        for (t <- cands) {
          if (t == b) return dist
          if (!seen(t)) { seen += t; next += t }
        }
      }
      frontier = next.toList
      if (frontier.isEmpty) return Int.MaxValue // unreachable
    }
    -1
  }

  private def sparkDl(pairs: Seq[(String, String)]): Map[(String, String), Int] = {
    GraftExpressions.ensure(spark)
    pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        GraftExpressions.damerauLevenshtein(col("a"), col("b")).as("d"))
      .as[(String, String, Int)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
  }

  test("native DL matches BFS ground truth on exhaustive small pairs") {
    val rnd = new scala.util.Random(41)
    val pool = (1 to 120).map { _ =>
      (0 to rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    } :+ ""
    val pairs = (1 to 250).map { _ =>
      (pool(rnd.nextInt(pool.size)), pool(rnd.nextInt(pool.size)))
    }.distinct
    val got = sparkDl(pairs)
    for ((a, b) <- pairs)
      assert(got((a, b)) == bfsDistance(a, b), s"dl('$a','$b')")
  }

  test("unrestricted DL: transposition chains and known values") {
    val got = sparkDl(Seq(
      ("CA", "ABC"),          // 2 unrestricted (OSA would say 3)
      ("ab", "ba"),           // one transposition
      ("kitten", "sitting"),  // classic levenshtein 3, no transposition
      ("abcdef", "abdcef"),   // one interior transposition
      ("", "abc"), ("abc", ""), ("same", "same")))
    assert(got(("CA", "ABC")) == 2)
    assert(got(("ab", "ba")) == 1)
    assert(got(("kitten", "sitting")) == 3)
    assert(got(("abcdef", "abdcef")) == 1)
    assert(got(("", "abc")) == 3)
    assert(got(("abc", "")) == 3)
    assert(got(("same", "same")) == 0)
  }

  test("DL is symmetric and never exceeds plain levenshtein") {
    GraftExpressions.ensure(spark)
    val rnd = new scala.util.Random(67)
    val pairs = (1 to 300).map { _ =>
      def mk = (0 to rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      (mk, mk)
    }
    val rows = pairs.toDF("a", "b")
      .select(
        GraftExpressions.damerauLevenshtein(col("a"), col("b")).as("dab"),
        GraftExpressions.damerauLevenshtein(col("b"), col("a")).as("dba"),
        levenshtein(col("a"), col("b")).as("lev"))
      .as[(Int, Int, Int)].collect()
    for ((dab, dba, lev) <- rows) {
      assert(dab == dba)
      assert(dab <= lev)
    }
  }

  test("NFC composes decomposed sequences, is idempotent, fixes ASCII") {
    GraftExpressions.ensure(spark)
    val decomposedCafe = "Cafe\u0301"   // e + U+0301 COMBINING ACUTE
    val composedCafe = "Caf\u00e9"      // precomposed
    val decomposedRing = "A\u030aberg"  // A + U+030A COMBINING RING
    val composedRing = "\u00c5berg"     // precomposed
    val inputs = Seq(decomposedCafe, composedCafe, decomposedRing,
      "plain ascii 123", "")
    val rows = inputs.toDF("s")
      .select(col("s"), GraftExpressions.nfc(col("s")).as("n"),
        GraftExpressions.nfc(GraftExpressions.nfc(col("s"))).as("nn"),
        length(col("s")).as("ls"), length(col("n")).as("ln"))
      .as[(String, String, String, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(decomposedCafe)._2 == composedCafe)
    assert(rows(decomposedCafe)._4 == 5 && rows(decomposedCafe)._5 == 4)
    assert(rows(composedCafe)._2 == composedCafe)
    assert(rows(decomposedRing)._2 == composedRing)
    assert(rows("plain ascii 123")._2 == "plain ascii 123")
    assert(rows("")._2 == "")
    rows.values.foreach { r => assert(r._2 == r._3, "idempotent") }
  }
}
