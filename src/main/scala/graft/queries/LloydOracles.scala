package graft.queries

/** Generated DuckDB replays of the FIXED-POINT Lloyd trainers and their
  * ANN/dedup consumers — the round-10 promotion of the last iterative
  * training loops out of rows-only (q_ann_ivf, q_ann_pq, q_ann_ivfpq,
  * q_dedup_semdedup).
  *
  * The trainers ([[graft.ext.Similarity.kmeansCentroidsFromSample]] /
  * `kmeansL2`) run in exact integer arithmetic — DECIMAL(18,5)-scaled
  * elements, integer argmax/argmin with deterministic tie-breaks, half-up
  * integer means, exact isqrt norm rescale — so each bounded Lloyd
  * iteration unrolls to order-independent BIGINT CTEs (the q_bpe_train /
  * label-propagation technique). Downstream float machinery (kernel
  * cosine/dot, SPANN spill, ADC) replays via ordered `list_reduce` folds
  * mirroring the kernels' left-to-right double accumulation.
  *
  * Every fragment here is validated step-by-step against the Scala
  * trainers' actual output by scripts/scratch_kmeans.py (python mirror +
  * DuckDB chain vs graft.tools.DumpQuantizer) — keep the two in sync.
  */
private[queries] object LloydOracles {

  // --- shared SQL fragments -----------------------------------------------

  /** Ordered left-fold sum of a list expression (mirrors the native
    * kernels' left-to-right double accumulation; 0.0 + x == x exactly, so
    * starting the fold at the first element is identical).
    */
  private def fold(ex: String): String =
    s"list_reduce($ex, (a, b) -> a + b)"

  private[queries] def sq(a: String): String =
    fold(s"list_transform($a, x -> x * x)")

  private[queries] def dotn(a: String, b: String, n: Int): String =
    fold(s"list_transform(range($n), t -> $a[t + 1] * $b[t + 1])")

  /** Round-half-away-from-zero integer division — sign-magnitude so
    * DuckDB `//` (and Spark driver `/` on longs) agree on negatives;
    * mirrors [[graft.ext.Similarity.divHalfUp]].
    */
  private[queries] def halfUp(num: String, den: String): String =
    s"CASE WHEN ($num) < 0 THEN -(((-($num)) * 2 + ($den)) // (2 * ($den)))" +
      s" ELSE (($num) * 2 + ($den)) // (2 * ($den)) END"

  /** One-step-corrected exact isqrt of column n2 given t0 =
    * floor(sqrt(n2::DOUBLE)) — mirrors [[graft.ext.Similarity.isqrt]].
    */
  private val isqCorr: String =
    "CASE WHEN (t0 + 1) * (t0 + 1) <= n2 THEN t0 + 1 " +
      "WHEN t0 * t0 > n2 THEN t0 - 1 ELSE t0 END"

  /** Element quantization: the DECIMAL(18,5) VARCHAR-hop (== Spark/driver
    * BigDecimal.valueOf + HALF_UP setScale, the round-5 parity) scaled to
    * integers.
    */
  private[queries] def scaleElem(x: String): String =
    s"CAST(CAST(CAST(CAST($x AS DOUBLE) AS VARCHAR) AS DECIMAL(18,5)) " +
      s"* 100000 AS BIGINT)"

  /** XXH64 hashLong(vec_id, 42) sample-rank chain → `sampled(vec_id,
    * rnk)` over `vecs` — the HUGEINT machinery proven by q_ann_pq_init.
    */
  private[queries] def hashLongSampleCtes: String = {
    val M = "18446744073709551616::HUGEINT"
    val S = "9223372036854775808::HUGEINT"
    def mulmod(a: String, p: String): String =
      s"((($a) % 4294967296::HUGEINT) * $p::HUGEINT" +
        s" + ((($a) // 4294967296::HUGEINT) * $p::HUGEINT" +
        s" % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $M"
    def rotl(v: String, r: Int): String =
      s"((($v) * ${1L << r}::HUGEINT) % $M + ($v) // ${java.lang.Long.toUnsignedString(1L << (64 - r))}::HUGEINT)"
    def toS(u: String): String =
      s"CAST(($u) - CASE WHEN ($u) >= $S THEN $M ELSE 0::HUGEINT END AS BIGINT)"
    def toU(x: String): String =
      s"(CAST(($x) AS HUGEINT) + CASE WHEN ($x) < 0 THEN $M ELSE 0::HUGEINT END)"
    def xorU(a: String, b: String): String =
      toU(s"xor(${toS(a)}, ${toS(b)})")
    def xorShift(u: String, sh: Int): String =
      toU(s"xor(${toS(u)}, CAST(($u) // ${1L << sh}::HUGEINT AS BIGINT))")
    val (p1, p2, p3, p4) = ("11400714785074694791", "14029467366897019727",
      "1609587929392839161", "9650029242287828579")
    val h0 = java.lang.Long.toUnsignedString(42L + 0x27D4EB2F165667C5L + 8L)
    val steps = Seq(
      mulmod("v", p2), rotl("v", 31), mulmod("v", p1),
      xorU("v", s"$h0::HUGEINT"), rotl("v", 27),
      s"(${mulmod("v", p1)} + $p4::HUGEINT) % $M",
      xorShift("v", 33), mulmod("v", p2), xorShift("v", 29),
      mulmod("v", p3), xorShift("v", 32))
    val chain = steps.zipWithIndex.map { case (e, i) =>
      val from = if (i == 0) "hl0" else s"hl$i"
      s"hl${i + 1} AS (SELECT vec_id, $e AS v FROM $from)"
    }.mkString(",\n    ")
    s"""hl0 AS (SELECT vec_id, CAST(vec_id AS HUGEINT) AS v FROM vecs),
    $chain,
    sampled AS (SELECT vec_id, row_number() OVER (ORDER BY ${toS("v")}) AS rnk
      FROM hl${steps.length})"""
  }

  // --- fixed-point spherical Lloyd (coarse quantizer) ---------------------

  /** CTE chain `svecs … c{iters}` training the spherical quantizer:
    * c{iters} holds (cid, i0, cv) integer centroids at the fixed
    * CentroidScale norm. `kLimit`/`sampleLimit` are SQL expressions so
    * callers can make k data-dependent (q_dedup_semdedup's n/500 rule).
    */
  private[queries] def kmeansSphericalCtes(
      kLimit: String, sampleLimit: String, iters: Int,
      centScale: Long = 1000000L): String = {
    val head = s"""svecs AS MATERIALIZED (
      SELECT r.rnk, list_transform(v.embedding, x -> ${scaleElem("x")}) AS sv
      FROM vecs v JOIN sampled r ON v.vec_id = r.vec_id AND r.rnk <= $sampleLimit),
    selems AS MATERIALIZED (
      SELECT rnk, generate_subscripts(sv, 1) - 1 AS i0, unnest(sv) AS sx
      FROM (SELECT rnk, sv FROM svecs
            WHERE ${fold("list_transform(sv, x -> abs(x))")} > 0)),
    kinit0 AS (SELECT sv, min(rnk) AS mr FROM svecs
      WHERE ${fold("list_transform(sv, x -> abs(x))")} > 0
      GROUP BY sv),
    kinit1 AS (SELECT sv, row_number() OVER (ORDER BY mr) - 1 AS cid
      FROM kinit0 QUALIFY cid < $kLimit),
    kinit2 AS (SELECT cid, generate_subscripts(sv, 1) - 1 AS i0, unnest(sv) AS mu,
      ${fold("list_transform(sv, x -> x * x)")} AS n2
      FROM kinit1),
    kinit3 AS (SELECT cid, i0, mu, n2,
      CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS t0 FROM kinit2),
    c0 AS MATERIALIZED (SELECT cid, i0,
      ${halfUp(s"mu * $centScale", isqCorr)} AS cv
      FROM kinit3)"""
    val steps = (1 to iters).map { it =>
      val p = it - 1
      s"""kd$it AS (SELECT s.rnk, c.cid, sum(s.sx * c.cv) AS d
      FROM selems s JOIN c$p c USING (i0) GROUP BY 1, 2),
    ka$it AS MATERIALIZED (SELECT rnk, cid FROM (
      SELECT rnk, cid, row_number() OVER (PARTITION BY rnk ORDER BY d DESC, cid) AS rn
      FROM kd$it) WHERE rn = 1),
    km$it AS (SELECT a.cid, s.i0, sum(s.sx) AS sv, count(*) AS m
      FROM ka$it a JOIN selems s USING (rnk) GROUP BY 1, 2),
    kmu$it AS (SELECT cid, i0, ${halfUp("sv", "m")} AS mu FROM km$it),
    kn$it AS (SELECT cid, sum(mu * mu) AS n2 FROM kmu$it GROUP BY 1),
    kq$it AS (SELECT cid, n2, CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT) AS t0
      FROM kn$it WHERE n2 > 0),
    kw$it AS (SELECT cid, $isqCorr AS isq FROM kq$it),
    ku$it AS (SELECT mu.cid, mu.i0, ${halfUp(s"mu.mu * $centScale", "w.isq")} AS cv
      FROM kmu$it mu JOIN kw$it w USING (cid)),
    c$it AS MATERIALIZED (SELECT c.cid, c.i0, COALESCE(u.cv, c.cv) AS cv
      FROM c$p c LEFT JOIN ku$it u ON u.cid = c.cid AND u.i0 = c.i0)"""
    }
    (head +: steps).mkString(",\n    ")
  }

  /** Shared post-training CTEs: trained integer centroids → the float
    * literals the Spark plan embeds (`kcf`, one correctly-rounded double
    * division + float downcast per element), their kernel-normalized
    * unit rows (`kcu`), and the corpus as double lists (`vl`).
    */
  private def centroidFloatCtes(
      iters: Int, centScale: Long, vlSrc: String = "vecs"): String =
    s"""kcf AS MATERIALIZED (
      SELECT cid, list_transform(list(cv ORDER BY i0), x ->
        CAST(CAST(CAST(x AS DOUBLE) / $centScale.0 AS FLOAT) AS DOUBLE)) AS fl
      FROM c$iters GROUP BY cid),
    kcu AS MATERIALIZED (
      SELECT cid, list_transform(fl, x -> x / sqrt(${sq("fl")})) AS ul
      FROM kcf),
    vl AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM $vlSrc)"""

  /** SPANN closure-spill membership replay ([[graft.functions
    * .SpilledCentroidIds]]): per-vector kernel cosines against the unit
    * centroid matrix, best-minus-delta threshold, (cos desc, cid) cap.
    */
  private def spillAssignCtes(dim: Int, delta: Double, cap: Int): String =
    s"""vdots AS (SELECT v.vec_id, c.cid, ${dotn("v.dl", "c.ul", dim)} AS d,
                     sqrt(${sq("v.dl")}) AS nv
              FROM vl v, kcu c),
    vcos AS MATERIALIZED (
      SELECT vec_id, cid, d / nv AS cs FROM vdots WHERE nv > 0),
    vbest AS (SELECT vec_id, max(cs) AS best FROM vcos GROUP BY 1),
    assigned AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, v.cid, row_number() OVER (
          PARTITION BY v.vec_id ORDER BY v.cs DESC, v.cid) AS rn
        FROM vcos v JOIN vbest b USING (vec_id)
        WHERE v.cs >= b.best - $delta) WHERE rn <= $cap)"""

  /** Probe-side nProbe list ranking ([[graft.ext.Similarity]] rankedSims:
    * FloatVectorCosine against the RAW float centroids, ties to the
    * lowest cid).
    */
  private def probeListCtes(dim: Int, nProbe: Int): String =
    s"""probes AS (SELECT vec_id AS q_id, dl AS ql FROM vl WHERE vec_id < 3),
    pdots AS (SELECT p.q_id, c.cid,
                ${dotn("p.ql", "c.fl", dim)} / (sqrt(${sq("p.ql")}) * sqrt(${sq("c.fl")})) AS cs
              FROM probes p, kcf c),
    plists AS (SELECT q_id, cid FROM (
        SELECT q_id, cid, row_number() OVER (
          PARTITION BY q_id ORDER BY cs DESC, cid) AS rn
        FROM pdots) WHERE rn <= $nProbe)"""

  /** Exact-cosine rerank tail over a `(q_id, vec_id)` candidate set named
    * `cand`, emitting the final (q_id, vec_id, cosine) top-k.
    */
  private def rerankTail(dim: Int, k: Int): String =
    s"""rer AS (SELECT c.q_id, c.vec_id,
              ${dotn("p.dl", "v.dl", dim)} / (sqrt(${sq("p.dl")}) * sqrt(${sq("v.dl")})) AS cs
            FROM cand c
            JOIN vl p ON p.vec_id = c.q_id
            JOIN vl v ON v.vec_id = c.vec_id)
    SELECT q_id, vec_id, round(cs, 4) AS cosine
    FROM (SELECT *, row_number() OVER (
            PARTITION BY q_id ORDER BY cs DESC, vec_id) AS rn
          FROM rer) r
    WHERE rn <= $k ORDER BY q_id, vec_id"""

  /** q_ann_ivf: fixed-point spherical kmeans + SPANN spill + nProbe probe
    * + exact-cosine rerank.
    */
  private[queries] def ivfKmeansOracle(
      nCentroids: Int, samplesPerCentroid: Int, iters: Int, dim: Int,
      nProbe: Int, k: Int, spillDelta: Double, spillCap: Int): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL),
    $hashLongSampleCtes,
    ${kmeansSphericalCtes(nCentroids.toString, (nCentroids * samplesPerCentroid).toString, iters)},
    ${centroidFloatCtes(iters, 1000000L)},
    ${spillAssignCtes(dim, spillDelta, spillCap)},
    ${probeListCtes(dim, nProbe)},
    cand AS (SELECT DISTINCT p.q_id, a.vec_id
             FROM plists p JOIN assigned a USING (cid)
             WHERE a.vec_id <> p.q_id),
    ${rerankTail(dim, k)}"""

  /** q_ann_ivf_append: the quantizer trains on the CORPUS slice only
    * (vec_id % 7 <> 0 — `vecs` drives both the sample hash and the
    * Lloyd chain), while assignment, probing, and rerank run over ALL
    * vectors — exactly [[graft.ext.Similarity.ivfIndex]] on the corpus
    * followed by [[graft.ext.Similarity.ivfAppend]] of the % 7 batch:
    * both sides assign against the same frozen centroids with the same
    * kernel, so build+append postings equal one frozen-centroid pass
    * over the union.
    */
  private[queries] def ivfAppendOracle(
      nCentroids: Int, samplesPerCentroid: Int, iters: Int, dim: Int,
      nProbe: Int, k: Int, spillDelta: Double, spillCap: Int): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id % 7 <> 0),
    allv AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL),
    $hashLongSampleCtes,
    ${kmeansSphericalCtes(nCentroids.toString, (nCentroids * samplesPerCentroid).toString, iters)},
    ${centroidFloatCtes(iters, 1000000L, "allv")},
    ${spillAssignCtes(dim, spillDelta, spillCap)},
    ${probeListCtes(dim, nProbe)},
    cand AS (SELECT DISTINCT p.q_id, a.vec_id
             FROM plists p JOIN assigned a USING (cid)
             WHERE a.vec_id <> p.q_id),
    ${rerankTail(dim, k)}"""

  /** q_index_health: the [[ivfAppendOracle]] setup (corpus-trained
    * frozen quantizer, spill assignment over ALL vectors = the appended
    * index's postings) followed by the health gauge — per-centroid
    * posting counts, quantized assignment-quality mass
    * `floor(cos(member, centroid)·10⁶)` split build/appended, the
    * balanced-share list load, and the appended-vs-build mean-sim
    * drift. All double outputs derive from exact integers by one
    * bit-identical division/subtraction per value.
    */
  private[queries] def ivfHealthOracle(
      nCentroids: Int, samplesPerCentroid: Int, iters: Int, dim: Int,
      spillDelta: Double, spillCap: Int): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id % 7 <> 0),
    allv AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL),
    $hashLongSampleCtes,
    ${kmeansSphericalCtes(nCentroids.toString, (nCentroids * samplesPerCentroid).toString, iters)},
    ${centroidFloatCtes(iters, 1000000L, "allv")},
    ${spillAssignCtes(dim, spillDelta, spillCap)},
    hsim AS MATERIALIZED (
      SELECT a.cid, a.vec_id,
             CAST(floor((${dotn("v.dl", "c.fl", dim)} / (sqrt(${sq("v.dl")}) * sqrt(${sq("c.fl")}))) * 1000000.0) AS BIGINT) AS q6
      FROM assigned a JOIN vl v USING (vec_id) JOIN kcf c USING (cid)),
    ${healthTail("vec_id % 7 <> 0")}"""

  /** The one-row REBUILD-DUE decision over a `hsim (cid, vec_id, q6)`
    * CTE — the replay of [[graft.ext.Similarity.indexRebuildDecision]]
    * fed by health(base)/health(grown): exact integer masses aggregated
    * across all lists, two double divisions, the documented threshold
    * comparisons. `buildPred` selects the BUILD-side members (= the
    * base index's postings, which append passes through untouched).
    */
  private def decisionTail(
      buildPred: String, maxListLoad: Double, driftFloor: Double): String =
    s"""hbld AS (SELECT cid, count(*) AS nb, CAST(sum(q6) AS BIGINT) AS sb
             FROM hsim WHERE $buildPred GROUP BY cid),
    hall AS (SELECT cid, count(*) AS nt, CAST(sum(q6) AS BIGINT) AS st
             FROM hsim GROUP BY cid),
    hj AS (SELECT c.cid,
             COALESCE(b.nb, 0) AS nb, COALESCE(b.sb, 0) AS sb,
             COALESCE(a.nt, 0) AS nt, COALESCE(a.st, 0) AS st
           FROM (SELECT DISTINCT cid FROM kcf) c
           LEFT JOIN hbld b USING (cid) LEFT JOIN hall a USING (cid)),
    hagg AS (SELECT max(nt) AS maxnt, count(*) AS nl,
               CAST(sum(nt) AS BIGINT) AS tt, CAST(sum(nb) AS BIGINT) AS nbs,
               CAST(sum(sb) AS BIGINT) AS sbs, CAST(sum(st) AS BIGINT) AS sts
             FROM hj),
    hdec AS (SELECT
        CAST(maxnt * nl AS DOUBLE) / CAST(tt AS DOUBLE) AS max_list_load,
        (CASE WHEN tt > nbs
           THEN CAST(sts - sbs AS DOUBLE) / CAST((tt - nbs) * 1000000 AS DOUBLE) END)
        - (CASE WHEN nbs > 0
             THEN CAST(sbs AS DOUBLE) / CAST(nbs * 1000000 AS DOUBLE) END)
          AS sim_drift
      FROM hagg)
    SELECT max_list_load, sim_drift,
      max_list_load >= $maxListLoad
        OR COALESCE(sim_drift <= $driftFloor, false) AS rebuild_due
    FROM hdec"""

  /** q_index_rebuild_due: the [[ivfHealthOracle]] setup followed by the
    * decision tail — one row, engine-replayable thresholds.
    */
  private[queries] def ivfRebuildDueOracle(
      nCentroids: Int, samplesPerCentroid: Int, iters: Int, dim: Int,
      spillDelta: Double, spillCap: Int,
      maxListLoad: Double, driftFloor: Double): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id % 7 <> 0),
    allv AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL),
    $hashLongSampleCtes,
    ${kmeansSphericalCtes(nCentroids.toString, (nCentroids * samplesPerCentroid).toString, iters)},
    ${centroidFloatCtes(iters, 1000000L, "allv")},
    ${spillAssignCtes(dim, spillDelta, spillCap)},
    hsim AS MATERIALIZED (
      SELECT a.cid, a.vec_id,
             CAST(floor((${dotn("v.dl", "c.fl", dim)} / (sqrt(${sq("v.dl")}) * sqrt(${sq("c.fl")}))) * 1000000.0) AS BIGINT) AS q6
      FROM assigned a JOIN vl v USING (vec_id) JOIN kcf c USING (cid)),
    ${decisionTail("vec_id % 7 <> 0", maxListLoad, driftFloor)}"""

  /** q_index_rebuild_due_sem: the [[semHealthOracle]] setup followed by
    * the decision tail.
    */
  private[queries] def semRebuildDueOracle(
      iters: Int, dim: Int, splitId: Long,
      maxListLoad: Double, driftFloor: Double): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id < $splitId),
    $hashLongSampleCtes,
    kparam AS (SELECT GREATEST(8, LEAST(64, count(*) // 500)) AS k,
      GREATEST(8, LEAST(64, count(*) // 500)) * ${graft.ext.Similarity.KmeansSamplesPerCentroid} AS n
      FROM embeddings WHERE vec_id < $splitId),
    ${kmeansSphericalCtes("(SELECT k FROM kparam)", "(SELECT n FROM kparam)", iters)},
    ${centroidFloatCtes(iters, 1000000L)},
    allv AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM embeddings WHERE embedding IS NOT NULL),
    vdots AS (SELECT v.vec_id, c.cid, ${dotn("v.dl", "c.ul", dim)} AS d
              FROM allv v, kcu c),
    assigned AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM vdots) WHERE rn = 1),
    unitv AS MATERIALIZED (
      SELECT vec_id, list_transform(dl, x ->
        CAST(CAST(x / sqrt(${sq("dl")}) AS FLOAT) AS DOUBLE)) AS ul
      FROM allv),
    hsim AS MATERIALIZED (
      SELECT a.cid, a.vec_id,
             CAST(floor((${dotn("u.ul", "c.fl", dim)} / (sqrt(${sq("u.ul")}) * sqrt(${sq("c.fl")}))) * 1000000.0) AS BIGINT) AS q6
      FROM assigned a JOIN unitv u USING (vec_id) JOIN kcf c USING (cid)),
    ${decisionTail(s"vec_id < $splitId", maxListLoad, driftFloor)}"""

  /** Shared health aggregation + drift SELECT over a `hsim (cid,
    * vec_id, q6)` CTE — the build/total split, the balanced-share list
    * load, and the bit-identical double means/drift. `buildPred`
    * selects the BUILD-side members.
    */
  private def healthTail(buildPred: String): String =
    s"""hbld AS (SELECT cid, count(*) AS nb, CAST(sum(q6) AS BIGINT) AS sb
             FROM hsim WHERE $buildPred GROUP BY cid),
    hall AS (SELECT cid, count(*) AS nt, CAST(sum(q6) AS BIGINT) AS st
             FROM hsim GROUP BY cid),
    hj AS (SELECT c.cid,
             COALESCE(b.nb, 0) AS nb, COALESCE(b.sb, 0) AS sb,
             COALESCE(a.nt, 0) AS nt, COALESCE(a.st, 0) AS st
           FROM (SELECT DISTINCT cid FROM kcf) c
           LEFT JOIN hbld b USING (cid) LEFT JOIN hall a USING (cid)),
    htot AS (SELECT CAST(sum(nt) AS BIGINT) AS tt, count(*) AS nl FROM hj)
    SELECT cid, nb AS n_build, nt AS n_total, nt - nb AS n_appended,
           CAST(nt * t.nl AS DOUBLE) / CAST(t.tt AS DOUBLE) AS list_load,
           CASE WHEN nb > 0 THEN CAST(sb AS DOUBLE) / CAST(nb * 1000000 AS DOUBLE) END AS mean_sim_build,
           CASE WHEN nt > nb THEN CAST(st - sb AS DOUBLE) / CAST((nt - nb) * 1000000 AS DOUBLE) END AS mean_sim_appended,
           (CASE WHEN nt > nb THEN CAST(st - sb AS DOUBLE) / CAST((nt - nb) * 1000000 AS DOUBLE) END) - (CASE WHEN nb > 0 THEN CAST(sb AS DOUBLE) / CAST(nb * 1000000 AS DOUBLE) END) AS sim_drift
    FROM hj, htot t ORDER BY cid"""

  /** q_index_health_sem: the [[incrementalSemOracle]] setup (corpus-
    * trained kmeans at the data-dependent k, frozen argmax assignment
    * of ALL vectors = the appended index's member rows, float-unit
    * member vectors) followed by the same health tail — assignment
    * quality is `floor(cos(unit member, raw float centroid)·10⁶)`,
    * exactly [[graft.ext.Dedup.semIndexHealth]]'s quantization.
    */
  private[queries] def semHealthOracle(
      iters: Int, dim: Int, splitId: Long): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id < $splitId),
    $hashLongSampleCtes,
    kparam AS (SELECT GREATEST(8, LEAST(64, count(*) // 500)) AS k,
      GREATEST(8, LEAST(64, count(*) // 500)) * ${graft.ext.Similarity.KmeansSamplesPerCentroid} AS n
      FROM embeddings WHERE vec_id < $splitId),
    ${kmeansSphericalCtes("(SELECT k FROM kparam)", "(SELECT n FROM kparam)", iters)},
    ${centroidFloatCtes(iters, 1000000L)},
    allv AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM embeddings WHERE embedding IS NOT NULL),
    vdots AS (SELECT v.vec_id, c.cid, ${dotn("v.dl", "c.ul", dim)} AS d
              FROM allv v, kcu c),
    assigned AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM vdots) WHERE rn = 1),
    unitv AS MATERIALIZED (
      SELECT vec_id, list_transform(dl, x ->
        CAST(CAST(x / sqrt(${sq("dl")}) AS FLOAT) AS DOUBLE)) AS ul
      FROM allv),
    hsim AS MATERIALIZED (
      SELECT a.cid, a.vec_id,
             CAST(floor((${dotn("u.ul", "c.fl", dim)} / (sqrt(${sq("u.ul")}) * sqrt(${sq("c.fl")}))) * 1000000.0) AS BIGINT) AS q6
      FROM assigned a JOIN unitv u USING (vec_id) JOIN kcf c USING (cid)),
    ${healthTail(s"vec_id < $splitId")}"""

  // --- fixed-point L2 Lloyd (PQ codebooks) --------------------------------

  /** CTE chain `ssubs … cb{iters}`: per-subspace fixed-point L2 Lloyd
    * codebooks for all m subspaces at once — cb{iters} holds (j, ci,
    * scaled-long codeword list).
    */
  private[queries] def pqCodebookCtes(
      m: Int, ksub: Int, dsub: Int, iters: Int, sampleN: Int): String = {
    val head = s"""ssubs AS MATERIALIZED (
      SELECT r.rnk, u.j, list_transform(range($dsub), t ->
        ${scaleElem(s"v.embedding[u.j * $dsub + t + 1]")}) AS ssv
      FROM vecs v
      JOIN sampled r ON v.vec_id = r.vec_id AND r.rnk <= $sampleN,
           unnest(range($m)) AS u(j)),
    cb0 AS MATERIALIZED (
      SELECT j, ssv, row_number() OVER (PARTITION BY j ORDER BY mr) - 1 AS ci
      FROM (SELECT j, ssv, min(rnk) AS mr FROM ssubs GROUP BY j, ssv)
      QUALIFY row_number() OVER (PARTITION BY j ORDER BY mr) <= $ksub)"""
    val dist = fold(s"list_transform(range($dsub), t -> " +
      s"(s.ssv[t + 1] - c.ssv[t + 1]) * (s.ssv[t + 1] - c.ssv[t + 1]))")
    val steps = (1 to iters).map { it =>
      val p = it - 1
      s"""pa$it AS MATERIALIZED (SELECT rnk, j, ci FROM (
      SELECT s.rnk, s.j, c.ci, row_number() OVER (
        PARTITION BY s.rnk, s.j ORDER BY $dist ASC, c.ci) AS rn
      FROM ssubs s JOIN cb$p c USING (j)) WHERE rn = 1),
    ps$it AS (SELECT a.j, a.ci, t.t AS ti,
        sum(s.ssv[t.t + 1]) AS sv, count(*) AS cnt
      FROM pa$it a JOIN ssubs s USING (rnk, j), unnest(range($dsub)) AS t(t)
      GROUP BY 1, 2, 3),
    pmu$it AS (SELECT j, ci, list(${halfUp("sv", "cnt")} ORDER BY ti) AS ssv
      FROM ps$it GROUP BY 1, 2),
    cb$it AS MATERIALIZED (SELECT c.j, c.ci, COALESCE(n.ssv, c.ssv) AS ssv
      FROM cb$p c LEFT JOIN pmu$it n ON n.j = c.j AND n.ci = c.ci)"""
    }
    (head +: steps).mkString(",\n    ")
  }

  /** Shared PQ encode/score CTEs over trained codebooks: float codewords
    * (`cbf`), per-(vector, subspace) score tables (`scores` — the shared
    * ||c||² − 2·x·c metric), and argmin codes (`codes`).
    */
  private def pqEncodeCtes(m: Int, dsub: Int, iters: Int): String =
    s"""cbf AS MATERIALIZED (
      SELECT j, ci, list_transform(ssv, x ->
        CAST(CAST(CAST(x AS DOUBLE) / 100000.0 AS FLOAT) AS DOUBLE)) AS sv
      FROM cb$iters),
    subs AS MATERIALIZED (
      SELECT v.vec_id, u.j, list_transform(range($dsub), t ->
        CAST(v.embedding[u.j * $dsub + t + 1] AS DOUBLE)) AS sv
      FROM vecs v, unnest(range($m)) AS u(j)),
    scores AS MATERIALIZED (
      SELECT s.vec_id, s.j, c.ci,
             ${sq("c.sv")} - 2.0 * ${dotn("s.sv", "c.sv", dsub)} AS sc
      FROM subs s JOIN cbf c USING (j)),
    codes AS MATERIALIZED (
      SELECT vec_id, j, ci AS code FROM (
        SELECT vec_id, j, ci, row_number() OVER (
          PARTITION BY vec_id, j ORDER BY sc, ci) AS rn
        FROM scores) WHERE rn = 1)"""

  /** q_ann_pq: fixed-point L2 codebooks + ADC scan + exact-cosine rerank. */
  private[queries] def pqKmeansOracle(
      m: Int, ksub: Int, dsub: Int, iters: Int, sampleN: Int,
      dim: Int, k: Int, rerankFactor: Int): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL),
    $hashLongSampleCtes,
    ${pqCodebookCtes(m, ksub, dsub, iters, sampleN)},
    ${pqEncodeCtes(m, dsub, iters)},
    vl AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM vecs),
    adcp AS (SELECT q.vec_id AS q_id, c.vec_id,
               ${fold("list(q.sc ORDER BY q.j)")} AS adc
             FROM codes c JOIN scores q
               ON q.j = c.j AND q.ci = c.code AND q.vec_id < 3
             WHERE c.vec_id <> q.vec_id
             GROUP BY 1, 2),
    cand AS (SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
          PARTITION BY q_id ORDER BY adc, vec_id) AS rn
        FROM adcp) WHERE rn <= ${k * rerankFactor}),
    ${rerankTail(dim, k)}"""

  /** q_ann_ivfpq: spilled fixed-point IVF lists × fixed-point PQ-ADC
    * scoring (one shared prefix-stable sample), rerank by exact cosine.
    */
  private[queries] def ivfPqKmeansOracle(
      nCentroids: Int, kmIters: Int, m: Int, ksub: Int, dsub: Int,
      pqIters: Int, sampleN: Int, dim: Int, nProbe: Int, k: Int,
      rerankFactor: Int, spillDelta: Double, spillCap: Int): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL),
    $hashLongSampleCtes,
    ${kmeansSphericalCtes(nCentroids.toString, (nCentroids * graft.ext.Similarity.KmeansSamplesPerCentroid).toString, kmIters)},
    ${pqCodebookCtes(m, ksub, dsub, pqIters, sampleN)},
    ${centroidFloatCtes(kmIters, 1000000L)},
    ${spillAssignCtes(dim, spillDelta, spillCap)},
    ${probeListCtes(dim, nProbe)},
    ${pqEncodeCtes(m, dsub, pqIters)},
    candl AS (SELECT DISTINCT p.q_id, a.vec_id
             FROM plists p JOIN assigned a USING (cid)
             WHERE a.vec_id <> p.q_id),
    adcp AS (SELECT n.q_id, n.vec_id,
               ${fold("list(q.sc ORDER BY q.j)")} AS adc
             FROM candl n
             JOIN codes c ON c.vec_id = n.vec_id
             JOIN scores q ON q.vec_id = n.q_id
               AND q.j = c.j AND q.ci = c.code
             GROUP BY 1, 2),
    cand AS (SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
          PARTITION BY q_id ORDER BY adc, vec_id) AS rn
        FROM adcp) WHERE rn <= ${k * rerankFactor}),
    ${rerankTail(dim, k)}"""

  // --- fixed-point hard-sigmoid logistic GD (quality classifier) ---------

  /** q_quality_classifier: the DuckDB replay of
    * [[graft.ext.QualityClassifier]]'s fixed-point gradient-descent
    * training loop plus the held-out scoring pass. All-integer at scale
    * 10^6 (features halfUp-quantized token shares, hard-sigmoid
    * probabilities, halfUp weight updates with lr = lrQ/1000), so each of
    * the bounded iterations unrolls to order-independent BIGINT CTEs —
    * the same technique as the Lloyd trainers above.
    */
  private[queries] def logregOracle(
      dims: Int, iters: Int, lrQ: Long, trainMaxId: Long): String =
    logregScoreChain(dims, iters, lrQ, trainMaxId) + s"""
    SELECT doc_id, CAST(${halfUp("pq", "100")} AS DOUBLE) / 10000.0 AS quality_prob
    FROM sp ORDER BY doc_id"""

  /** q_quality_topp: the same trained/scored chain, gated to the top
    * `keepPerMille`/1000 by the exact discrete quantile — t = the
    * (n − n·kpm div 1000 + 1)-th smallest integer score, threshold ties
    * kept ([[graft.ext.QualityClassifier.topPGate]]'s rule; the OFFSET
    * formulation is the sorted-order equivalent of the histogram
    * cumulative one).
    */
  private[queries] def logregTopPOracle(
      dims: Int, iters: Int, lrQ: Long, trainMaxId: Long,
      keepPerMille: Long): String =
    logregScoreChain(dims, iters, lrQ, trainMaxId) + s""",
    mtot AS (SELECT count(*) AS n FROM sp),
    thr AS (SELECT pq AS t FROM sp ORDER BY pq
      OFFSET (SELECT n - (n * $keepPerMille) // 1000 FROM mtot) LIMIT 1)
    SELECT doc_id, CAST(${halfUp("pq", "100")} AS DOUBLE) / 10000.0 AS quality_prob
    FROM sp WHERE pq >= (SELECT t FROM thr) ORDER BY doc_id"""

  /** Shared WITH-chain of the fixed-point GD trainer + scorer: ends at
    * `sp` (doc_id, pq) — integer hard-sigmoid scores at scale 10^6 for
    * every non-training document.
    */
  private def logregScoreChain(
      dims: Int, iters: Int, lrQ: Long, trainMaxId: Long): String = {
    val S = 1000000L
    val bucket = "CAST((CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)" +
      s" & 2147483647) % $dims AS BIGINT)"
    val steps = (1 to iters).map { it =>
      val p = it - 1
      s"""z$it AS (SELECT f.doc_id, sum(f.xq * w.wq) AS zq, min(f.yq) AS yq
      FROM tf f JOIN w$p w USING (bucket) GROUP BY 1),
    e$it AS (SELECT doc_id,
      LEAST($S, GREATEST(0, ${halfUp("zq", (4L * S).toString)} + ${S / 2})) - yq AS eq
      FROM z$it),
    g$it AS (SELECT f.bucket, sum(e.eq * f.xq) AS gq
      FROM tf f JOIN e$it e USING (doc_id) GROUP BY 1),
    w$it AS MATERIALIZED (SELECT w.bucket,
      w.wq - COALESCE(${halfUp(s"$lrQ * g.gq", s"1000 * nd.n * $S")}, 0) AS wq
      FROM w$p w CROSS JOIN nd LEFT JOIN g$it g USING (bucket))"""
    }.mkString(",\n    ")
    s"""WITH lab AS (SELECT doc_id,
        CASE WHEN lang = 'en' THEN $S ELSE 0 END AS yq
      FROM documents WHERE doc_id < $trainMaxId),
    toks AS MATERIALIZED (
      SELECT d.doc_id, u.term AS tok
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents WHERE text IS NOT NULL) d, unnest(d.t) AS u(term)
      WHERE u.term <> ''),
    cnts AS (SELECT doc_id, $bucket AS bucket, count(*) AS cnt
      FROM toks GROUP BY 1, 2),
    tot AS MATERIALIZED (SELECT doc_id, sum(cnt) AS n FROM cnts GROUP BY 1),
    feats AS MATERIALIZED (
      SELECT c.doc_id, c.bucket, (c.cnt * $S * 2 + t.n) // (t.n * 2) AS xq
      FROM cnts c JOIN tot t USING (doc_id)
      UNION ALL
      SELECT doc_id, $dims AS bucket, $S AS xq FROM tot),
    tf AS MATERIALIZED (
      SELECT f.doc_id, f.bucket, f.xq, l.yq
      FROM feats f JOIN lab l USING (doc_id)),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    w0 AS (SELECT CAST(u.b AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS wq
      FROM unnest(range(${dims + 1})) AS u(b)),
    $steps,
    sz AS (SELECT f.doc_id, sum(f.xq * w.wq) AS zq
      FROM feats f JOIN w$iters w USING (bucket)
      WHERE f.doc_id >= $trainMaxId GROUP BY 1),
    sp AS (SELECT doc_id,
      LEAST($S, GREATEST(0, ${halfUp("zq", (4L * S).toString)} + ${S / 2})) AS pq
      FROM sz)"""
    // Rendering note for both finals: Spark's round(double, 4) hops
    // through the SHORTEST decimal rendering (BigDecimal.valueOf), which
    // for pq/10^6 is the exact 6-digit decimal — so its 4-dp HALF_UP
    // equals integer halfUp(pq, 100)/10^4 exactly; DuckDB round(DOUBLE,
    // 4) would instead round the raw binary double and diverge at
    // boundaries.
  }

  /** q_dedup_semdedup: fixed-point kmeans with the DATA-DEPENDENT
    * k = clamp(count/500, 8, 64) sizing rule, hard argmax assignment
    * (NearestCentroidId), within-cluster lower-id pair threshold on
    * float unit vectors, anti-join survivors.
    */
  private[queries] def semdedupOracle(
      iters: Int, dim: Int, eps: Double): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL),
    $hashLongSampleCtes,
    kparam AS (SELECT GREATEST(8, LEAST(64, count(*) // 500)) AS k,
      GREATEST(8, LEAST(64, count(*) // 500)) * ${graft.ext.Similarity.KmeansSamplesPerCentroid} AS n
      FROM embeddings),
    ${kmeansSphericalCtes("(SELECT k FROM kparam)", "(SELECT n FROM kparam)", iters)},
    ${centroidFloatCtes(iters, 1000000L)},
    vdots AS (SELECT v.vec_id, c.cid, ${dotn("v.dl", "c.ul", dim)} AS d
              FROM vl v, kcu c),
    assigned AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM vdots) WHERE rn = 1),
    unitv AS MATERIALIZED (
      SELECT vec_id, list_transform(dl, x ->
        CAST(CAST(x / sqrt(${sq("dl")}) AS FLOAT) AS DOUBLE)) AS ul
      FROM vl),
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM assigned a
      JOIN assigned b ON a.cid = b.cid AND b.vec_id < a.vec_id
      JOIN unitv u1 ON u1.vec_id = a.vec_id
      JOIN unitv u2 ON u2.vec_id = b.vec_id
      WHERE ${dotn("u1.ul", "u2.ul", dim)} >= $eps)
    SELECT a.vec_id, a.cid AS cluster_id
    FROM assigned a ANTI JOIN dropped d ON a.vec_id = d.vec_id
    ORDER BY a.vec_id"""

  /** q_dedup_inc_sem: the incremental SemDeDup admission replay — the
    * fixed-point kmeans trains on the CORPUS half only (vec_id <
    * splitId, exactly what [[graft.ext.Dedup.semDedupIndex]] freezes),
    * every vector assigns to the frozen centroids by the same argmax,
    * and the batch half (vec_id >= splitId) screens against corpus
    * members first (min corpus id within eps in-cluster), then against
    * batch peers (min batch id within eps in-cluster, self included),
    * the [[graft.ext.Dedup.incrementalSemDedup]] coalesce contract.
    */
  private[queries] def incrementalSemOracle(
      iters: Int, dim: Int, eps: Double, splitId: Long): String =
    s"""WITH vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id < $splitId),
    $hashLongSampleCtes,
    kparam AS (SELECT GREATEST(8, LEAST(64, count(*) // 500)) AS k,
      GREATEST(8, LEAST(64, count(*) // 500)) * ${graft.ext.Similarity.KmeansSamplesPerCentroid} AS n
      FROM embeddings WHERE vec_id < $splitId),
    ${kmeansSphericalCtes("(SELECT k FROM kparam)", "(SELECT n FROM kparam)", iters)},
    ${centroidFloatCtes(iters, 1000000L)},
    allv AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM embeddings WHERE embedding IS NOT NULL),
    vdots AS (SELECT v.vec_id, c.cid, ${dotn("v.dl", "c.ul", dim)} AS d
              FROM allv v, kcu c),
    assigned AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM vdots) WHERE rn = 1),
    unitv AS MATERIALIZED (
      SELECT vec_id, list_transform(dl, x ->
        CAST(CAST(x / sqrt(${sq("dl")}) AS FLOAT) AS DOUBLE)) AS ul
      FROM allv),
    vc AS (
      SELECT b.vec_id, min(c.vec_id) AS crep
      FROM assigned b
      JOIN assigned c ON c.cid = b.cid AND c.vec_id < $splitId
      JOIN unitv u1 ON u1.vec_id = b.vec_id
      JOIN unitv u2 ON u2.vec_id = c.vec_id
      WHERE b.vec_id >= $splitId
        AND ${dotn("u1.ul", "u2.ul", dim)} >= $eps
      GROUP BY 1),
    vb AS (
      SELECT b.vec_id, min(p.vec_id) AS brep
      FROM assigned b
      JOIN assigned p ON p.cid = b.cid AND p.vec_id >= $splitId
      JOIN unitv u1 ON u1.vec_id = b.vec_id
      JOIN unitv u2 ON u2.vec_id = p.vec_id
      WHERE b.vec_id >= $splitId
        AND ${dotn("u1.ul", "u2.ul", dim)} >= $eps
      GROUP BY 1)
    SELECT e.vec_id,
      coalesce(vc.crep, vb.brep, e.vec_id) AS rep_id,
      (coalesce(vc.crep, vb.brep, e.vec_id) <> e.vec_id) AS is_dup
    FROM embeddings e
    LEFT JOIN vc ON vc.vec_id = e.vec_id
    LEFT JOIN vb ON vb.vec_id = e.vec_id
    WHERE e.vec_id >= $splitId
    ORDER BY e.vec_id"""

  /** q_ingest_e2e semantic-screen FRAGMENT (no WITH, no final select):
    * the [[incrementalSemOracle]] machinery — corpus-trained (vec_id <
    * splitId) fixed-point quantizer, frozen argmax assignment of every
    * vector, float-unit member vectors — with the two screens restricted
    * to a caller-defined survivor CTE `s3all(doc_id)` (the rows that
    * reached the semantic stage): corpus members stay authoritative, but
    * batch PEERS must themselves have survived every earlier stage.
    * Exposes `semf(doc_id, sem_rep, sem_dup)` over all of `s3all`
    * (vector-less rows admit themselves — no vector, no evidence) and
    * `assigned(vec_id, cid)` — the frozen argmax, which IS the `sem_cid`
    * of every member [[graft.ext.Dedup.semIndexAppend]] records.
    */
  private[queries] def ingestSemCtes(
      k: Int, iters: Int, dim: Int, eps: Double, splitId: Long): String =
    s"""vecs AS MATERIALIZED (
        SELECT vec_id, embedding FROM embeddings
        WHERE embedding IS NOT NULL AND vec_id < $splitId),
    $hashLongSampleCtes,
    ${kmeansSphericalCtes(k.toString,
        (k * graft.ext.Similarity.KmeansSamplesPerCentroid).toString, iters)},
    ${centroidFloatCtes(iters, 1000000L)},
    allv AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dl
      FROM embeddings WHERE embedding IS NOT NULL),
    svdots AS (SELECT v.vec_id, c.cid, ${dotn("v.dl", "c.ul", dim)} AS d
              FROM allv v, kcu c),
    assigned AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        FROM svdots) WHERE rn = 1),
    unitv AS MATERIALIZED (
      SELECT vec_id, list_transform(dl, x ->
        CAST(CAST(x / sqrt(${sq("dl")}) AS FLOAT) AS DOUBLE)) AS ul
      FROM allv),
    vcrep AS (
      SELECT b.vec_id, min(c.vec_id) AS crep
      FROM assigned b
      JOIN s3all s ON s.doc_id = b.vec_id
      JOIN assigned c ON c.cid = b.cid AND c.vec_id < $splitId
      JOIN unitv u1 ON u1.vec_id = b.vec_id
      JOIN unitv u2 ON u2.vec_id = c.vec_id
      WHERE ${dotn("u1.ul", "u2.ul", dim)} >= $eps
      GROUP BY 1),
    vbrep AS (
      SELECT b.vec_id, min(p.vec_id) AS brep
      FROM assigned b
      JOIN s3all s ON s.doc_id = b.vec_id
      JOIN assigned p ON p.cid = b.cid
      JOIN s3all s2 ON s2.doc_id = p.vec_id
      JOIN unitv u1 ON u1.vec_id = b.vec_id
      JOIN unitv u2 ON u2.vec_id = p.vec_id
      WHERE ${dotn("u1.ul", "u2.ul", dim)} >= $eps
      GROUP BY 1),
    semf AS MATERIALIZED (
      SELECT s.doc_id,
        coalesce(vcrep.crep, vbrep.brep, s.doc_id) AS sem_rep,
        (coalesce(vcrep.crep, vbrep.brep, s.doc_id) <> s.doc_id) AS sem_dup
      FROM s3all s
      LEFT JOIN vcrep ON vcrep.vec_id = s.doc_id
      LEFT JOIN vbrep ON vbrep.vec_id = s.doc_id)"""

  /** q_ingest_e2e IVF-append FRAGMENT: the `"lowid"` coarse quantizer —
    * centroids are the `nCentroids` lowest-id non-null corpus vectors
    * (ids = the vec_ids themselves, [[graft.ext.Similarity
    * .lowestIdCentroids]]), kernel-normalized to unit doubles — and the
    * hard argmax-dot assignment of [[graft.functions.NearestCentroidId]]
    * (ties → lowest matrix index = lowest cid). Expects `allv` from
    * [[ingestSemCtes]]; exposes `ivfa(vec_id, cid)` — the posting list
    * [[graft.ext.Similarity.ivfAppend]] records for each appended row.
    */
  private[queries] def ingestIvfCtes(
      nCentroids: Int, dim: Int, splitId: Long): String =
    s"""icent AS MATERIALIZED (
      SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cl
      FROM (SELECT vec_id, embedding FROM embeddings
            WHERE embedding IS NOT NULL AND vec_id < $splitId
            ORDER BY vec_id LIMIT $nCentroids)),
    icu AS MATERIALIZED (
      SELECT cid, list_transform(cl, x -> x / sqrt(${sq("cl")})) AS ul
      FROM icent),
    ivfa AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT v.vec_id, c.cid, row_number() OVER (
          PARTITION BY v.vec_id ORDER BY ${dotn("v.dl", "c.ul", dim)} DESC, c.cid) AS rn
        FROM allv v, icu c) r WHERE rn = 1)"""
}
