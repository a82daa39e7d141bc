package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.VectorFunctions.float_vector_cosine

/** Native FloatVectorCosine vs the higher-order-function formulation:
  * bit-identical results (same left-to-right double accumulation), null
  * handling, and codegen execution.
  */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native cosine is bit-identical to the HOF fold on real embeddings") {
    val pairs = vecs.limit(50).crossJoin(
      vecs.limit(50).select(col("vec_id").as("id2"), col("embedding").as("emb2")))
    val diffs = pairs.select(
      float_vector_cosine(col("embedding"), col("emb2")).as("native"),
      Similarity.cosineHof(col("embedding"), col("emb2")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact comparison, not tolerance
      .count()
    assert(diffs === 0)
  }

  test("null inputs yield null, not an error") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f, 1.0f))),
      (Some(Array(1.0f, 1.0f)), None))
      .toDF("a", "b")
    val out = df.select(float_vector_cosine(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0) === false)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("zero-norm vectors and length mismatches yield NULL, matching the HOF path") {
    val df = Seq(
      (1L, Array(0.0f, 0.0f), Array(1.0f, 1.0f)),   // zero-norm left
      (2L, Array(1.0f, 1.0f), Array(0.0f, 0.0f)),   // zero-norm right
      (3L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))) // length mismatch
      .toDF("id", "a", "b")
    val out = df.select(col("id"), float_vector_cosine(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out === Map(1L -> true, 2L -> true, 3L -> true))

    // NULL (not NaN) means zero vectors sort LAST under desc — they must
    // never win a top-k window
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val top1 = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        probes, "q_id", "q_emb", k = 1)
      .select("vec_id").as[Long].head()
    assert(top1 === 1L, "zero vector must not be the nearest neighbor")
  }

  test("known values: identical, orthogonal, antipodal") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), -1.0))
      .toDF("a", "b", "expect")
    df.select(float_vector_cosine(col("a"), col("b")).as("got"), col("expect"))
      .collect().foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("the expression executes inside whole-stage codegen (no fallback)") {
    val df = vecs.select(
      float_vector_cosine(col("embedding"), col("embedding")).as("c"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"expected codegen'd project:\n${p.take(1500)}")
  }

  test("type mismatch is rejected at analysis time") {
    val bad = Seq((Array(1.0, 2.0), Array(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(float_vector_cosine(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>"))
  }

  test("nearest-centroid kernel matches the cosine-struct argmax on real embeddings") {
    import graft.functions.CentroidFunctions
    val e = vecs.select("vec_id", "embedding")
    for (quantizer <- Seq("kmeans", "lowid"); k <- Seq(8, 64)) {
      val cents = Similarity.centroidsFor(e, "vec_id", "embedding", k, quantizer)
      // reference: explicit per-centroid cosine + greatest-struct argmax
      // (the formulation the kernel replaced), built inline here
      val structs = array(cents.map { case (cid, cv) =>
        struct(float_vector_cosine(col("embedding"), typedlit(cv)).as("sim"),
          lit(-cid).as("negid"))
      }: _*)
      val both = e
        .withColumn("kernel",
          CentroidFunctions.nearest_centroid_id(col("embedding"), cents))
        .withColumn("structs", -array_max(structs).getField("negid"))
      val diffs = both.filter(col("kernel") =!= col("structs")).count()
      assert(diffs === 0, s"$quantizer k=$k: kernel diverges from struct argmax")
    }
  }

  test("nearest-centroid kernel: ties to lowest id, NULL and length-mismatch to NULL") {
    import graft.functions.CentroidFunctions
    val cents = Array(
      (10L, Array(1.0f, 0.0f)),
      (11L, Array(1.0f, 0.0f)), // exact duplicate centroid -> tie
      (12L, Array(0.0f, 1.0f)))
    val df = Seq(
      (1L, Some(Array(2.0f, 0.1f))),  // ties 10/11 -> 10 (lowest index)
      (2L, Some(Array(0.0f, 3.0f))),  // -> 12
      (3L, None),                     // NULL vec -> NULL
      (4L, Some(Array(1.0f, 1.0f, 1.0f)))) // dim mismatch -> NULL
      .toDF("id", "v")
    val out = df.select(col("id"),
        CentroidFunctions.nearest_centroid_id(col("v"), cents).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out === Map(1L -> 10L, 2L -> 12L, 3L -> -1L, 4L -> -1L))
  }

  test("spilled-centroid kernel matches the ranked-struct closure on real embeddings") {
    import graft.functions.CentroidFunctions
    val e = vecs.select("vec_id", "embedding")
    val cents = Similarity.centroidsFor(e, "vec_id", "embedding", 16, "kmeans")
    val delta = 0.05; val cap = 4
    // reference: the ranked-struct prefix filter the kernel replaced
    val structs = array(cents.map { case (cid, cv) =>
      struct(float_vector_cosine(col("embedding"), typedlit(cv)).as("sim"),
        lit(-cid).as("negid"))
    }: _*)
    val ranked = reverse(array_sort(structs))
    val best = element_at(ranked, 1).getField("sim")
    val kept = slice(
      filter(ranked, s => s.getField("sim") >= best - lit(delta)), 1, cap)
    val both = e
      .withColumn("kernel", CentroidFunctions.spilled_centroid_ids(
        col("embedding"), cents, delta, cap))
      .withColumn("structs", transform(kept, s => -s.getField("negid")))
    val diffs = both
      .filter(not(col("kernel") <=> col("structs"))).count()
    assert(diffs === 0, "spill kernel diverges from ranked-struct closure")
  }
}
