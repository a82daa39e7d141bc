package graft

import org.apache.spark.sql.functions._

import graft.ext.{LangId, TextAnalysis}

/** Contract tests for the char-trigram Naive Bayes language id
  * ([[graft.ext.LangId]]): real-text accuracy vs the stopword heuristic
  * on held-out sentences, model determinism, and the no-evidence
  * contract for NULL/short text.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  // Real sentences, 6 train + 2 held-out per language. French is the
  // adversarial case: the stopword heuristic knows only en/es/de and
  // must misfile every French sentence.
  private val train = Seq(
    ("en", "the quick brown fox jumps over the lazy dog"),
    ("en", "a journey of a thousand miles begins with a single step"),
    ("en", "to be or not to be that is the question"),
    ("en", "all that glitters is not gold and all who wander are not lost"),
    ("en", "the early bird catches the worm every single morning"),
    ("en", "actions speak louder than words in every language"),
    ("es", "el perro corre por el parque todas las mananas"),
    ("es", "la vida es un viaje que debemos disfrutar cada dia"),
    ("es", "los libros son ventanas abiertas hacia otros mundos"),
    ("es", "el tiempo pasa volando cuando estamos con amigos"),
    ("es", "las estrellas brillan sobre la ciudad dormida"),
    ("es", "de todas las cosas la paciencia es la mas valiosa"),
    ("de", "der hund lauft schnell durch den grossen park"),
    ("de", "die sonne scheint hell uber das ruhige tal"),
    ("de", "das leben ist eine reise und wir sind die reisenden"),
    ("de", "und am abend lesen wir gemeinsam ein gutes buch"),
    ("de", "der fruehe vogel faengt den wurm jeden morgen"),
    ("de", "die zeit vergeht schnell wenn man freude hat"),
    ("fr", "le chien court vite dans le grand parc vert"),
    ("fr", "la vie est un voyage que nous devons savourer"),
    ("fr", "les etoiles brillent au dessus de la ville endormie"),
    ("fr", "et le soir nous lisons ensemble un bon livre"),
    ("fr", "le temps passe vite quand on est avec des amis"),
    ("fr", "les livres sont des fenetres ouvertes sur le monde"))

  private val heldOut = Seq(
    (0L, "en", "the dog and the fox are friends in the forest"),
    (1L, "en", "a single word of kindness is worth a thousand coins"),
    (2L, "es", "el sol brilla sobre las casas del pueblo"),
    (3L, "es", "la paciencia de los abuelos es infinita"),
    (4L, "de", "der lehrer und die kinder singen das alte lied"),
    (5L, "de", "die blumen bluehen und der garten ist schoen"),
    (6L, "fr", "le professeur et les enfants chantent la chanson"),
    (7L, "fr", "les fleurs du jardin sont belles le matin"))

  test("NB language id beats the stopword heuristic on held-out real text") {
    val labeled = train.toDF("lang", "text")
    val model = LangId.train(labeled, "lang", "text", dims = 256, n = 3)
    assert(model.langs.toSeq == Seq("de", "en", "es", "fr"))
    val test = heldOut.toDF("doc_id", "truth", "text")
    val scored = LangId.score(test, "doc_id", "text", model).collect()
    val nb = scored.map(r => r.getLong(0) -> r.getString(1)).toMap
    // confidence margins are positive for clear single-language text
    assert(scored.forall(_.getLong(3) > 0L),
      s"margins: ${scored.map(r => (r.getLong(0), r.getLong(3))).toSeq}")
    val nbAcc = heldOut.count { case (id, truth, _) => nb(id) == truth }
    val heur = test
      .select(col("doc_id"), TextAnalysis.languageId(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val heurAcc = heldOut.count { case (id, truth, _) => heur(id) == truth }
    // the heuristic cannot know French (und/en/es at best); NB must be
    // both strictly better and good in absolute terms
    assert(nbAcc >= 7, s"NB got $nbAcc/8: ${nb.toSeq.sortBy(_._1)}")
    assert(nbAcc > heurAcc, s"NB $nbAcc vs heuristic $heurAcc")
  }

  test("training is deterministic and the model is the bounded artifact") {
    val labeled = train.toDF("lang", "text")
    val m1 = LangId.train(labeled, "lang", "text", dims = 64, n = 3)
    val m2 = LangId.train(labeled, "lang", "text", dims = 64, n = 3)
    assert(m1.langs.toSeq == m2.langs.toSeq)
    assert(m1.priorQ.toSeq == m2.priorQ.toSeq)
    assert(m1.lpq.map(_.toSeq).toSeq == m2.lpq.map(_.toSeq).toSeq)
    assert(m1.lpq.forall(_.length == 64) && m1.lpq.length == 4)
    // priors: ln(6/24) quantized — identical for all four balanced langs
    assert(m1.priorQ.distinct.length == 1)
    assert(m1.priorQ.head == math.floor(math.log(6.0 / 24.0) * 1e6).toLong)
  }

  test("no-evidence documents are absent; short text yields no grams") {
    val labeled = train.toDF("lang", "text")
    val model = LangId.train(labeled, "lang", "text", dims = 64, n = 3)
    val test = Seq(
      (0L, "the quick brown fox"),
      (1L, null.asInstanceOf[String]),
      (2L, "ab")).toDF("doc_id", "text")
    val got = LangId.score(test, "doc_id", "text", model)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L))
    // charNgrams edge cases directly
    val grams = Seq(("a b", 1L), ("abc", 2L), ("ab", 3L))
      .toDF("t", "k")
      .select(col("k"), LangId.charNgrams(col("t"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(grams(1L) == Seq("a b"))
    assert(grams(2L) == Seq("abc"))
    assert(grams(3L) == Seq())
  }

  test("native one-pass scorer equals the composed explode+join form (r20)") {
    // LangId.score now computes per-language gram sums in one native
    // expression per row; this pins bit-equality of (lang_pred, scoreq,
    // marginq) against the legacy composed pipeline it replaced —
    // explode grams -> bucket -> broadcast model join -> per-doc sums —
    // on real corpus text (includes non-ASCII and whitespace runs).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val labeled = docs.where(col("doc_id") < 400)
    val model = LangId.train(labeled, "lang", "text", dims = 256, n = 3)
    val tail = docs.where(col("doc_id") >= 400)
    val native = LangId.score(tail, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // the legacy composed form, reconstructed inline
    val grams = LangId.bucketedGrams(tail, Seq("doc_id"), "text", model)
    val sums = grams
      .join(broadcast(LangId.modelFrame(spark, model)), Seq("_b"))
      .groupBy(col("doc_id"))
      .agg(LangId.sumCols(model).head, LangId.sumCols(model).tail: _*)
    val (bl, bs, bm) = LangId.argmaxExpr(model)
    val legacy = sums.select(col("doc_id"), bl, bs, bm)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(native === legacy)
    assert(native.nonEmpty)
    // unicode + boundary coverage beyond the corpus
    val edge = Seq((1L, "héllo wörld\t  x"), (2L, "日本語のテキストです"),
      (3L, "ab"), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val en = LangId.score(edge, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val eg = LangId.bucketedGrams(edge, Seq("doc_id"), "text", model)
      .join(broadcast(LangId.modelFrame(spark, model)), Seq("_b"))
      .groupBy(col("doc_id"))
      .agg(LangId.sumCols(model).head, LangId.sumCols(model).tail: _*)
      .select(col("doc_id"), bl, bs, bm)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(en === eg)
    assert(en.keySet === Set(1L, 2L))
  }
}
