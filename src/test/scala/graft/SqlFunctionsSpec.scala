package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextAnalysis}
import graft.functions.GraftFunctions

/** The SQL registration surface: every registered function must produce
  * the same result as its Column-API definition (macros share one
  * expression tree by construction; this guards the wiring).
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ready: Unit = {
    GraftFunctions.register(spark)
    Seq((1L, "the quick brown fox the quick"), (2L, "uno dos tres"))
      .toDF("id", "text").createOrReplaceTempView("sqlfn_docs")
  }

  test("macro functions match their Column-API twins via SQL") {
    ready
    val viaSql = spark.sql(
      """SELECT id, graft_simhash64(text) AS sh, graft_lang_id(text) AS lid,
               graft_doc_fingerprint(text) AS fp,
               graft_dup_token_frac(text) AS dtf,
               graft_dup_ngram_frac(text, 2) AS dnf
         FROM sqlfn_docs ORDER BY id""").collect().toSeq
    val viaCols = spark.table("sqlfn_docs")
      .select(col("id"), Dedup.simhash64(col("text")).as("sh"),
        TextAnalysis.languageId(col("text")).as("lid"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.dupTokenFrac(col("text")).as("dtf"),
        TextAnalysis.dupNgramFrac(col("text"), 2).as("dnf"))
      .orderBy("id").collect().toSeq
    assert(viaSql == viaCols)
  }

  test("nfc_normalize: composed/decomposed forms converge, fingerprints agree") {
    ready
    val composed = "café"          // é as U+00E9
    val decomposed = "cafe\u0301"   // e + combining acute accent
    val df = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"),
        (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = df.select(col("id"),
        graft.functions.NormalizeFunctions.nfc_normalize(col("text")).as("nfc"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out(1L) === composed)
    assert(out(2L) === composed)        // decomposed composes to the same bytes
    assert(out(3L) === "plain ascii")   // fast path: untouched
    assert(out(4L) === null)
    // dedup consequence: normalize-then-fingerprint collapses the pair
    val fps = df.filter(col("id") <= 2).select(
        md5(graft.functions.NormalizeFunctions.nfc_normalize(col("text"))))
      .collect().map(_.getString(0)).toSet
    assert(fps.size === 1)
    // and the SQL registration produces the same result
    df.createOrReplaceTempView("nfc_docs")
    val viaSql = spark.sql(
      "SELECT id, nfc_normalize(text) AS nfc FROM nfc_docs ORDER BY id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(viaSql === out)
  }

  test("winnow fingerprints: SQL default and explicit (k, w) forms") {
    ready
    val d = spark.sql(
      "SELECT id, graft_winnow_fingerprints(text) AS f FROM sqlfn_docs ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val e = spark.sql(
      "SELECT id, graft_winnow_fingerprints(text, 8, 4) AS f FROM sqlfn_docs ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(d == e)
    assert(d(1L).nonEmpty)

    // non-literal k must be rejected at analysis, not mis-planned
    val err = intercept[Exception] {
      spark.sql("SELECT graft_winnow_fingerprints(text, CAST(id AS INT), 4) FROM sqlfn_docs")
        .collect()
    }
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("float_vector_cosine stays registered through the shared descriptor list") {
    ready
    val r = spark.sql(
      "SELECT float_vector_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").collect()
    assert(r.head.getDouble(0) == 1.0)
  }

  test("float_vector_dot registered: known dot product via SQL") {
    ready
    val r = spark.sql(
      "SELECT float_vector_dot(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT)))").collect()
    assert(r.head.getDouble(0) == 23.0)
  }

  test("graft_banned_count: blocklist screen scoring column from SQL") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "the BIG slow merge was big"), (2L, "clean text"),
      (3L, null.asInstanceOf[String]))
      .toDF("id", "text").createOrReplaceTempView("blk_sql_t")
    val r = spark.sql(
      "SELECT id, graft_banned_count(text, 'slow,big,merge') AS n " +
        "FROM blk_sql_t ORDER BY id").collect()
    assert(r(0).getLong(1) == 4L) // big(x2, case-folded) + slow + merge
    assert(r(1).getLong(1) == 0L)
    assert(r(2).isNullAt(1))
    // parity with the DataFrame operator's column
    val df = graft.ext.TextAnalysis.blocklistScreen(
      spark.table("blk_sql_t"), "text", Seq("slow", "big", "merge"))
    assert(df.orderBy("id").select("banned_count").collect().map(r =>
      if (r.isNullAt(0)) -1L else r.getLong(0)).toSeq == Seq(4L, 0L, -1L))
    // non-literal terms rejected at analysis
    val err = intercept[Exception] {
      spark.sql("SELECT graft_banned_count(text, text) FROM blk_sql_t").collect()
    }
    assert(err.getMessage.contains("string literal"), err.getMessage)
  }

  test("graft_char_entropy: fixed-point class entropy from SQL") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, "aabb"), (2L, "0123"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text").createOrReplaceTempView("ent_sql_t")
    val r = spark.sql(
      "SELECT id, graft_char_entropy(text, 256) AS e FROM ent_sql_t ORDER BY id")
      .collect()
    assert(r(0).getLong(1) == 1048576L) // exactly 1 bit
    assert(r(1).getLong(1) == 0L)       // digits fold into one class
    assert(r(2).isNullAt(1))
    // parity with the Column form
    val viaCol = spark.table("ent_sql_t").orderBy("id")
      .select(graft.functions.CharEntropyFunctions.char_entropy_q(col("text"), 256))
      .collect().map(x => if (x.isNullAt(0)) -1L else x.getLong(0)).toSeq
    assert(viaCol == Seq(1048576L, 0L, -1L))
  }

  test("graft_ccnet_bucket: frozen-cutoff bucket assignment from SQL") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 1500L), (2L, 700L), (3L, -50L))
      .toDF("id", "scoreq").createOrReplaceTempView("ccb_sql_t")
    val r = spark.sql(
      "SELECT id, graft_ccnet_bucket(scoreq, 'head:1200,middle:400', 'tail') AS b " +
        "FROM ccb_sql_t ORDER BY id").as[(Long, String)].collect().toSeq
    assert(r == Seq((1L, "head"), (2L, "middle"), (3L, "tail")))
    // the macro expands the SAME expression the Scala edge twin uses
    val viaScala = spark.table("ccb_sql_t")
      .select($"id", graft.ext.Relevance.bucketExpr(
        $"scoreq", Seq("head" -> 1200L, "middle" -> 400L), "tail").as("b"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(viaScala == r)
    val err = intercept[Exception] {
      spark.sql(
        "SELECT graft_ccnet_bucket(scoreq, 'head:notanint', 'tail') FROM ccb_sql_t")
        .collect()
    }
    assert(err.getMessage.contains("must be an integer"), err.getMessage)
  }

  test("url macro functions: canonicalize/host/domain callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(Tuple1("HTTPS://WWW.News.BBC.co.uk:443/a/?utm_source=x&b=1"))
      .toDF("url").createOrReplaceTempView("urls_sql_t")
    val r = spark.sql(
      """SELECT graft_url_canonicalize(url) AS c, graft_url_host(url) AS h,
           graft_registered_domain(graft_url_host(url)) AS d
         FROM urls_sql_t""").as[(String, String, String)].collect().head
    assert(r == (("https://www.news.bbc.co.uk/a?b=1", "www.news.bbc.co.uk", "bbc.co.uk")))
  }
}
