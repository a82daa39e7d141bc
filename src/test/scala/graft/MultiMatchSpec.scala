package graft

import org.apache.spark.sql.functions._

import graft.functions.{MultiMatchFunctions, MultiMatchImpl}

/** Aho–Corasick watchlist matching: classic overlap cases, brute-force
  * parity, large watchlists, and null/empty edges.
  */
class MultiMatchSpec extends SparkSpec {
  import spark.implicits._

  private def count(s: String, pats: Seq[String]): Long =
    Seq(Tuple1(s)).toDF("t")
      .select(MultiMatchFunctions.multi_match_count(col("t"), pats))
      .as[Long].head()

  test("classic he/she/his/hers overlaps all count") {
    val pats = Seq("he", "she", "his", "hers")
    assert(count("ushers", pats) === 3L) // she, he, hers
    assert(count("shis", pats) === 1L)   // his
    assert(count("hehehe", pats) === 3L)
    assert(count("xyz", pats) === 0L)
  }

  test("self-overlapping patterns count every position") {
    assert(count("aaaa", Seq("aa")) === 3L)
    assert(count("abababa", Seq("aba")) === 3L)
    // duplicates in the watchlist collapse
    assert(count("aaaa", Seq("aa", "aa")) === 3L)
  }

  test("brute-force parity on random texts and watchlists") {
    val rng = new scala.util.Random(11)
    val alphabet = "abc"
    for (trial <- 1 to 30) {
      val text = (1 to 200).map(_ => alphabet(rng.nextInt(3))).mkString
      val pats = (1 to 8).map(_ =>
        (1 to (1 + rng.nextInt(4))).map(_ => alphabet(rng.nextInt(3))).mkString)
        .distinct
      val brute = pats.map { p =>
        (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong
      }.sum
      assert(count(text, pats) === brute, s"trial $trial pats=$pats")
    }
  }

  test("a 10k-literal watchlist runs one pass, no alternation blowup") {
    val pats = (0 until 10000).map(i => f"indicator-$i%05d")
    val text = "noise indicator-00042 noise indicator-09999 indicator-00042!"
    assert(count(text, pats) === 3L)
  }

  test("null in null out; empty text zero") {
    val r = Seq(Some("spark"), None, Some("")).toDF("t")
      .select(MultiMatchFunctions.multi_match_count(col("t"), Seq("spark")))
      .as[Option[Long]].collect()
    assert(r.toSeq === Seq(Some(1L), None, Some(0L)))
    assert(intercept[IllegalArgumentException] {
      MultiMatchImpl.automaton(Seq(""))
    }.getMessage.contains("empty pattern"))
  }
}
