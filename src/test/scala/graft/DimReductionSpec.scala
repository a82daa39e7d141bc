package graft

import org.apache.spark.sql.functions._

import graft.ext.DimReduction

/** Mathematical sanity for [[graft.ext.DimReduction]] — the oracle gate
  * pins cross-engine exactness; these pin that the reducers actually DO
  * what their names claim on the real embedding corpus.
  */
class DimReductionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("jlSign is deterministic and roughly balanced") {
    val signs = for (j <- 0 until 16; i <- 0 until 64) yield DimReduction.jlSign(j, i)
    assert(signs == signs.map(identity)) // stable across calls
    val pos = signs.count(_ > 0)
    assert(pos > 400 && pos < 624, s"sign matrix badly unbalanced: $pos/1024 positive")
  }

  test("JL projection approximately preserves pairwise distance ratios") {
    // JL with k=16 ±1 columns: squared-distance ratios concentrate
    // around E[|Px-Py|²] = k·|x-y|² — check the mean ratio over real
    // pairs lands near k with loose tolerance (the lemma's ε at k=16 is
    // wide; this guards gross sign/indexing bugs, not tight bounds)
    val p = DimReduction.jlProject(embs, "vec_id", "embedding", 16, 64)
    val both = embs.join(p, "vec_id").limit(40).collect()
    val vecs = both.map { r =>
      (r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray,
        (0 until 16).map(j => r.getAs[Double](s"p$j")).toArray)
    }
    val ratios = for {
      a <- vecs.indices; b <- vecs.indices if a < b
      d2 = vecs(a)._1.zip(vecs(b)._1).map { case (x, y) => (x - y) * (x - y) }.sum
      if d2 > 1e-9
      p2 = vecs(a)._2.zip(vecs(b)._2).map { case (x, y) => (x - y) * (x - y) }.sum
    } yield p2 / d2
    val mean = ratios.sum / ratios.size
    assert(mean > 16 * 0.5 && mean < 16 * 1.5,
      s"mean squared-distance ratio $mean far from k=16 — projection broken")
  }

  test("PCA component captures at least the best single axis's variance") {
    val model = DimReduction.pcaTrain(embs, "embedding", 64, 12)
    assert(model.compQ.length == 64 && model.meanQ.length == 64)
    // Rayleigh quotient of the returned component vs every coordinate
    // axis, on the SAME quantized centered data the trainer saw
    val rows = embs.select(col("embedding")).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    def q(x: Float): Long =
      java.math.BigDecimal.valueOf(x.toDouble)
        .setScale(5, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValue()
    val cent = rows.map(r => r.indices.map(i => (q(r(i)) - model.meanQ(i)).toDouble).toArray)
    val vn = math.sqrt(model.compQ.map(v => v.toDouble * v.toDouble).sum)
    val pcVar = cent.map { c =>
      val s = c.indices.map(i => c(i) * model.compQ(i).toDouble / vn).sum
      s * s
    }.sum
    val bestAxis = (0 until 64).map(i => cent.map(c => c(i) * c(i)).sum).max
    assert(pcVar >= bestAxis * 0.999,
      s"pc1 variance $pcVar below best single axis $bestAxis — iteration diverged")
  }

  test("pcaScores matches a driver-side replay of the integer projection") {
    val model = DimReduction.pcaTrain(embs, "embedding", 64, 12)
    val got = DimReduction.pcaScores(embs, "vec_id", "embedding", model)
      .orderBy("vec_id").as[(Long, Long)].collect()
    def q(x: Float): Long =
      java.math.BigDecimal.valueOf(x.toDouble)
        .setScale(5, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValue()
    val want = embs.select(col("vec_id"), col("embedding")).collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]](1)
      (r.getLong(0),
        v.indices.map(i => (q(v(i)) - model.meanQ(i)) * model.compQ(i)).sum)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("pcaTrainK: near-orthogonal components, pc2 captures no more than pc1") {
    val model = graft.ext.DimReduction.pcaTrainK(embs, "embedding", 64, 2, 12)
    val Array(v1, v2) = model.compsQ
    def dot(a: Array[Long], b: Array[Long]) =
      a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
    val cos = dot(v1, v2) / math.sqrt(dot(v1, v1) * dot(v2, v2))
    assert(math.abs(cos) < 0.05, s"components not orthogonal: cos=$cos")
    // Rayleigh quotients on the quantized centered data: pc1 >= pc2
    def q(x: Float): Long =
      java.math.BigDecimal.valueOf(x.toDouble)
        .setScale(5, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValue()
    val rows = embs.select(col("embedding")).collect()
      .map(_.getAs[scala.collection.Seq[Float]](0).toArray)
    def rayleigh(v: Array[Long]): Double = {
      val vn = math.sqrt(dot(v, v))
      rows.map { r =>
        val s = r.indices.map(i => (q(r(i)) - model.meanQ(i)) * v(i).toDouble / vn).sum
        s * s
      }.sum
    }
    val (r1, r2) = (rayleigh(v1), rayleigh(v2))
    assert(r1 >= r2 * 0.999, s"pc1 variance $r1 below pc2 $r2")
    // pcaTrainK shares the single trainer's mean and carries its
    // component as ONE of the two (possibly reordered by measured λ on
    // a near-degenerate spectrum — the documented ordering rule)
    val single = graft.ext.DimReduction.pcaTrain(embs, "embedding", 64, 12)
    assert(single.meanQ.toSeq == model.meanQ.toSeq)
    assert(model.compsQ.exists(_.toSeq == single.compQ.toSeq),
      "the power-iteration direction vanished from the top-2 set")
  }

  test("malformed vectors fail loudly; NULL vectors are a missing value") {
    val bad = Seq(
      (0L, Some(Array(1.0f, 2.0f, 3.0f, 4.0f))),
      (1L, Some(Array(1.0f, 2.0f)))).toDF("vec_id", "embedding") // short
    val e1 = intercept[Exception] {
      DimReduction.jlProject(bad, "vec_id", "embedding", 2, 4).collect()
    }
    assert(e1.getMessage.contains("jlProject"), e1.getMessage)
    val e2 = intercept[Exception] {
      DimReduction.pcaTrain(bad, "embedding", 4, 2)
    }
    assert(e2.getMessage.contains("pcaTrain"), e2.getMessage)
    // a NULL element inside the declared dims is malformed too
    val nullElem = Seq(
      (0L, Array[java.lang.Float](1.0f, 2.0f, 3.0f, 4.0f)),
      (1L, Array[java.lang.Float](1.0f, null, 3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val e3 = intercept[Exception] {
      DimReduction.jlProject(nullElem, "vec_id", "embedding", 2, 4).collect()
    }
    assert(e3.getMessage.contains("NULL elements"), e3.getMessage)
    // a NULL VECTOR is a missing value: jl passes it through as NULL
    // projections, the trainer excludes it from n on BOTH passes
    val withNull = Seq(
      (0L, Some(Array(1.0f, 2.0f, 3.0f, 4.0f))),
      (1L, Some(Array(5.0f, 6.0f, 7.0f, 8.0f))),
      (2L, None)).toDF("vec_id", "embedding")
    val jl = DimReduction.jlProject(withNull, "vec_id", "embedding", 2, 4)
      .orderBy("vec_id").collect()
    assert(jl.length == 3 && jl(2).isNullAt(1))
    val m = DimReduction.pcaTrain(withNull, "embedding", 4, 2)
    val mRef = DimReduction.pcaTrain(
      withNull.where(col("embedding").isNotNull), "embedding", 4, 2)
    assert(m.meanQ.toSeq == mRef.meanQ.toSeq &&
      m.compQ.toSeq == mRef.compQ.toSeq)
  }
}
