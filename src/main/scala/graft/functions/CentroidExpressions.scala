package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native centroid-assignment expressions.
  *
  * The naive assignment formulation — an `array(...)` of k per-centroid
  * cosine subtrees reduced with `array_max` — generates code LINEAR in k:
  * past ~64 centroids the fused whole-stage method exceeds what the JIT
  * will compile and the stage runs at interpreter speed (measured
  * ~10 ms/row at k = 64 on 32-dim vectors — thousands of times the
  * arithmetic cost). These expressions are one nested loop over a k×d
  * double matrix referenced as a constant object, so generated-method size
  * is k-INDEPENDENT and the kernel JITs like any small loop.
  *
  * Both expressions take PRE-NORMALIZED (unit) centroid rows: for a fixed
  * input vector, argmax over centroids of cosine(v, c) equals argmax of
  * dot(v, ĉ) — the |v| factor is constant and |ĉ| = 1. Semantic note: a
  * zero-NORM centroid scores dot 0 here, where the cosine-struct
  * formulation scored it NaN (and Spark's NaN-greatest ordering made it
  * attract every vector — an artifact, not a behavior worth preserving);
  * real quantizers never emit zero centroids.
  */
private[graft] object CentroidKernels {

  /** dots(v, ĉ_i) for all i; None when the vector's length mismatches. */
  def dots(v: ArrayData, unit: Array[Array[Double]]): Option[Array[Double]] = {
    val dim = unit(0).length
    if (v.numElements() != dim) return None
    val out = new Array[Double](unit.length)
    var c = 0
    while (c < unit.length) {
      val cv = unit(c); var d = 0.0; var i = 0
      while (i < dim) { d += v.getFloat(i).toDouble * cv(i); i += 1 }
      out(c) = d
      c += 1
    }
    Some(out)
  }
}

/** Argmax-dot centroid id: returns `ids(argmax_i dot(v, ĉ_i))`. Ties (and
  * all-NaN dot rows, where no strict > ever fires) resolve to the LOWEST
  * matrix index — matching the struct-array form's (sim, -id) max. NULL
  * vector, or a vector whose length mismatches the centroid dim, yields
  * NULL.
  */
case class NearestCentroidId(
    child: Expression, unit: Array[Array[Double]], ids: Array[Long])
    extends UnaryExpression {

  require(unit.nonEmpty && unit.length == ids.length,
    s"need matching non-empty centroids/ids, got ${unit.length}/${ids.length}")

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid_id"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    CentroidKernels.dots(input.asInstanceOf[ArrayData], unit) match {
      case None => null
      case Some(ds) =>
        var best = 0; var bestDot = ds(0); var c = 1
        while (c < ds.length) {
          if (ds(c) > bestDot) { bestDot = ds(c); best = c }
          c += 1
        }
        ids(best)
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("unitCentroids", unit, "double[][]")
      val idsRef = ctx.addReferenceObj("centroidIds", ids, "long[]")
      val dim = ctx.freshName("dim")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val cv = ctx.freshName("cv")
      val best = ctx.freshName("best"); val bestDot = ctx.freshName("bestDot")
      s"""
        int $dim = $m[0].length;
        if ($v.numElements() != $dim) {
          ${ev.isNull} = true;
        } else {
          int $best = 0;
          double $bestDot = Double.NEGATIVE_INFINITY;
          for (int $c = 0; $c < $m.length; $c++) {
            double[] $cv = $m[$c];
            double $d = 0.0;
            for (int $i = 0; $i < $dim; $i++) {
              $d += (double) $v.getFloat($i) * $cv[$i];
            }
            if ($c == 0 || $d > $bestDot) { $bestDot = $d; $best = $c; }
          }
          ${ev.value} = $idsRef[$best];
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SPANN closure-spill membership (Chen et al. 2021 §4.2): the ids of
  * every centroid whose COSINE to the vector is within `delta` of the
  * best, best-first (ties by matrix index), capped at `cap`. Cosine — not
  * raw dot — so `delta` keeps the scale the public API documents:
  * cos_i = dot(v, ĉ_i) / |v|. Zero/NaN vectors produce an empty array
  * (every comparison against the NaN best fails), matching the
  * struct-array form's behavior of spilling such rows into no list.
  * CodegenFallback: the selection loop is a leaf kernel in compiled
  * Scala, so fallback costs one boxed call per row, not an interpreted
  * expression tree.
  */
case class SpilledCentroidIds(
    child: Expression, unit: Array[Array[Double]], ids: Array[Long],
    delta: Double, cap: Int)
    extends UnaryExpression with CodegenFallback {

  require(unit.nonEmpty && unit.length == ids.length,
    s"need matching non-empty centroids/ids, got ${unit.length}/${ids.length}")
  require(delta >= 0, s"delta must be >= 0, got $delta")
  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "spilled_centroid_ids"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    CentroidKernels.dots(v, unit) match {
      case None => null
      case Some(ds) =>
        var norm = 0.0; var i = 0
        val n = v.numElements()
        while (i < n) {
          val x = v.getFloat(i).toDouble; norm += x * x; i += 1
        }
        norm = math.sqrt(norm)
        val cos = ds.map(_ / norm) // norm 0 -> NaN/Inf -> empty result below
        var best = Double.NegativeInfinity
        var c = 0
        while (c < cos.length) { if (cos(c) > best) best = cos(c); c += 1 }
        val threshold = best - delta
        // selection sort of qualifying indices by (cos desc, index asc);
        // k is a coarse-quantizer size, so O(k·cap) is trivial
        val sel = new Array[Int](math.min(cap, cos.length))
        val used = new Array[Boolean](cos.length)
        var out = 0
        var done = false
        while (out < sel.length && !done) {
          var pick = -1; var pickCos = Double.NegativeInfinity
          var j = 0
          while (j < cos.length) {
            if (!used(j) && cos(j) >= threshold && cos(j) > pickCos) {
              pick = j; pickCos = cos(j)
            }
            j += 1
          }
          if (pick < 0) done = true
          else { used(pick) = true; sel(out) = pick; out += 1 }
        }
        new GenericArrayData((0 until out).map(x => ids(sel(x))).toArray)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level wrappers. */
object CentroidFunctions {
  private def normalize(
      centroids: Array[(Long, Array[Float])]): (Array[Array[Double]], Array[Long]) = {
    val unit = centroids.map { case (_, cv) =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i).toDouble * cv(i); i += 1 }
      val n = math.sqrt(s)
      if (n == 0.0) new Array[Double](cv.length)
      else cv.map(_.toDouble / n)
    }
    (unit, centroids.map(_._1))
  }

  def nearest_centroid_id(
      v: Column, centroids: Array[(Long, Array[Float])]): Column = {
    val (unit, ids) = normalize(centroids)
    Bridge.column(NearestCentroidId(Bridge.expression(v), unit, ids))
  }

  def spilled_centroid_ids(
      v: Column, centroids: Array[(Long, Array[Float])],
      delta: Double, cap: Int): Column = {
    val (unit, ids) = normalize(centroids)
    Bridge.column(SpilledCentroidIds(Bridge.expression(v), unit, ids, delta, cap))
  }
}
