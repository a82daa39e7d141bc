package graft

import org.apache.spark.sql.functions._

import graft.functions.{CharEntropyFunctions, CharEntropyImpl}

/** Fixed-point character-class entropy: hand-computed values, class
  * folding, prefix capping, null/empty edges, and codegen/SQL parity.
  */
class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  private def entQ(s: String, maxChars: Int = 256): Long =
    Seq(Tuple1(s)).toDF("t")
      .select(CharEntropyFunctions.char_entropy_q(col("t"), maxChars))
      .as[Long].head()

  test("hand-computed values: uniform, constant, and two-class strings") {
    // "aabb": n=4, two classes of 2 -> exactly 1 bit = 2^20
    assert(entQ("aabb") === 1048576L)
    // four distinct letters -> 2 bits
    assert(entQ("abcd") === 2097152L)
    // constant string -> 0
    assert(entQ("aaaaaaaa") === 0L)
    // digits all fold into ONE class -> 0 despite 4 distinct chars
    assert(entQ("0123") === 0L)
  }

  test("ASCII case folds, other chars share the catch-all class") {
    assert(entQ("AaBb") === entQ("aabb"))
    // punctuation+space are one class: ". ," -> constant class
    assert(entQ(". ,;") === 0L)
    // non-ASCII falls into the same catch-all as punctuation
    assert(entQ("éé!!") === 0L)
  }

  test("prefix cap: only the first maxChars code points count") {
    assert(entQ("ab" + "c" * 100, maxChars = 2) === entQ("ab"))
    assert(entQ("ab" + "c" * 100, maxChars = 4) === entQ("abcc"))
  }

  test("null in null out; empty in zero out") {
    val r = Seq(Some("x"), None, Some("")).toDF("t")
      .select(CharEntropyFunctions.char_entropy_q(col("t"), 16))
      .as[Option[Long]].collect()
    assert(r.toSeq === Seq(Some(0L), None, Some(0L)))
  }

  test("matches a brute-force float computation within quantization error") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val s = (1 to rng.nextInt(300))
        .map(_ => "abcXYZ019 .!ü".charAt(rng.nextInt(13))).mkString
      val counted = s.take(256).map { c =>
        if (c >= 'a' && c <= 'z') c - 'a'
        else if (c >= 'A' && c <= 'Z') c - 'A'
        else if (c >= '0' && c <= '9') 26 else 27
      }
      val n = counted.size.toDouble
      val want =
        if (n == 0) 0.0
        else counted.groupBy(identity).values.map(_.size / n)
          .map(p => -p * math.log(p) / math.log(2.0)).sum
      val got = entQ(s) / 1048576.0
      assert(math.abs(got - want) < 0.001, s"got $got want $want for '$s'")
    }
  }

  test("SQL registration and frozen-table export agree with the Column form") {
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT graft_char_entropy('aabb', 256)").as[Long].head()
    assert(viaSql === 1048576L)
    // table export is the same array the JVM impl reads
    assert(CharEntropyImpl.log2qSqlValues(4) ===
      "(1, 0), (2, 1048576), (3, 1661953), (4, 2097152)")
  }
}
