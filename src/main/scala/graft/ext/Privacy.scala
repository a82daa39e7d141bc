package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for release/training corpora: k-anonymity and
  * l-diversity over declared quasi-identifier columns (Sweeney 2002;
  * Machanavajjhala et al. 2007). A record is re-identifiable when its
  * quasi-identifier combination is shared by fewer than k rows; a group
  * is attribute-disclosing when its sensitive column carries fewer than
  * l distinct values (everyone in the group shares the secret, so
  * linking ANY member leaks it).
  *
  * These are audit operators, not anonymizers: they surface the risk
  * mass a release would carry. The standard mitigation loop —
  * generalize a quasi column (coarser buckets), re-audit — composes from
  * these plus ordinary column arithmetic.
  *
  * Scale shape: one hash aggregate on the quasi key for k-anonymity and
  * one two-level aggregate for l-diversity — the same partial-aggregate
  * shuffles as any groupBy-count, nothing quadratic, no driver state.
  */
object Privacy {

  /** Per-group audit: (quasi..., n_rows, is_violating) for every
    * quasi-identifier combination; `is_violating` marks groups smaller
    * than k.
    */
  def kAnonymityGroups(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymityGroups needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("is_violating", col("n_rows") < k)
  }

  /** One-row release-risk summary: group counts, violating-group count,
    * rows at re-identification risk, and the at-risk per-mille of the
    * corpus (exact integer ratio).
    */
  def kAnonymitySummary(df: DataFrame, quasi: Seq[String], k: Long): DataFrame =
    kAnonymityGroups(df, quasi, k)
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("is_violating"), 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("is_violating"), col("n_rows")).otherwise(0L))
          .as("rows_at_risk"),
        sum(col("n_rows")).as("n_rows_total"))
      .withColumn("risk_pm", expr("(1000 * rows_at_risk) div n_rows_total"))

  /** Per-group l-diversity audit: (quasi..., n_rows, n_sensitive,
    * is_violating) — `n_sensitive` distinct non-NULL sensitive values,
    * violating when below l.
    */
  def lDiversityGroups(
      df: DataFrame, quasi: Seq[String], sensitive: String, l: Long): DataFrame = {
    require(quasi.nonEmpty, "lDiversityGroups needs at least one quasi-identifier")
    require(!quasi.contains(sensitive),
      "the sensitive column cannot also be a quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitive)).as("n_sensitive"))
      .withColumn("is_violating", col("n_sensitive") < l)
  }

  // --- differentially private release (Dwork et al. 2006) -------------
  //
  // The Laplace mechanism with SEEDED, group-keyed noise: u derives from
  // an md5 of (seed, mechanism tag, noise scale, group key), so a
  // release is reproducible — rerun the pipeline, publish the same
  // numbers — and engine-replayable (the correctness oracle recomputes
  // the identical noise).
  //
  // PRIVACY CONTRACT (read before publishing anything):
  //
  //  1. The seed is a SECRET, exactly as in any PRG-based DP deployment.
  //     An adversary without the seed faces the Laplace distribution; an
  //     adversary WITH it faces the exact counts. Never publish, log, or
  //     check in the seed of a real release; discard it after
  //     publication.
  //  2. The PRG input is DOMAIN-SEPARATED per release: the preimage is
  //     seed|mech|b|key ([[releaseTag]]), so two different releases over
  //     the same groups (e.g. a count at b = 2 and a sum at b = 100 000)
  //     draw INDEPENDENT-looking noise. Without the mech/b fold the two
  //     draws come from the same uniform and are perfectly correlated —
  //     50 000·count − sum would cancel the Laplace noise down to
  //     integer-rounding error (advice r14) — which silently voids the
  //     ε-composition accounting.
  //  3. ε COMPOSES, and the SEED IS THE RELEASE NONCE. k releases at ε
  //     each are (k·ε)-DP jointly ONLY when each uses a fresh seed (or
  //     differs in mechanism/scale): determinism means two releases
  //     with the same (seed, mech, b) over the same groups draw
  //     IDENTICAL noise — that is what reproducing a publication IS —
  //     so re-releasing refreshed data under an old seed lets the
  //     difference of the two releases cancel the noise exactly
  //     (review r15). One seed per release, tracked together with the
  //     spend in [[EpsilonLedger]]; nothing in the mechanism itself
  //     stops an over-budget or seed-reusing release.
  //
  // Noise is integerized as floor(x + 0.5) — nearest integer via a
  // boundary set (half-integers) unreachable from ln() doubles, the
  // established cross-engine-exact rounding idiom.

  /** The domain-separation tag folded in front of the group key:
    * `seed|mech|b`. Public so oracle generators embed the IDENTICAL
    * preimage prefix ([[graft.queries.DpQueries]]).
    */
  def releaseTag(seed: String, mech: String, b: Double): String =
    s"$seed|$mech|$b"

  /** u ∈ (0,1) \ {0.5} from the first 48 bits of md5(tag|key):
    * (h + 0.5) / 2^48 — never exactly 0 / 0.5 / 1, so the inverse CDF
    * below never sees ln(0) or a sign ambiguity.
    */
  private def unitUniform(tag: String, key: Column): Column =
    (conv(substring(md5(concat(lit(tag), lit("|"), key)), 1, 12), 16, 10)
      .cast("double") + lit(0.5)) / lit(281474976710656.0)

  /** Integer Laplace(b) noise by inverse CDF on the seeded,
    * domain-separated uniform: x = −b · sgn(u − ½) · ln(1 − 2·|u − ½|),
    * released as floor(x + 0.5).
    */
  private def laplaceNoise(
      seed: String, mech: String, b: Double, key: Column): Column = {
    val u = unitUniform(releaseTag(seed, mech, b), key)
    val centered = u - lit(0.5)
    val x = -lit(b) * signum(centered) * log(lit(1.0) - lit(2.0) * abs(centered))
    floor(x + lit(0.5)).cast("long")
  }

  /** Driver-side ε-budget accounting for a release pipeline: one
    * cumulative spend per dataset key, charged BEFORE each release;
    * an over-budget charge throws and the release never runs. This is
    * bookkeeping for the composition rule (contract note 3) — it keeps
    * an honest pipeline honest, it does not make the mechanism enforce
    * anything about data it never sees. Thread-safe; bounded by the
    * number of distinct datasets released.
    *
    * DURABILITY contract: without `path` the ledger is PROCESS-LOCAL
    * (an in-JVM map) — a second driver, or the same pipeline restarted,
    * starts from zero spend and can release past the budget. Supplying
    * `path` backs every charge with a small `LEDGER` file under the
    * ManifestTable discipline (read fresh state, check, atomic
    * temp+rename write), so spends survive restarts and two Ledger
    * instances SHARING the path see each other's charges.
    * MULTI-WRITER (round-17, same upgrade as ManifestTable's commit):
    * every durable charge's read-check-write runs under an OS file lock
    * on `LEDGER_LOCK` plus a per-path JVM monitor, so concurrent
    * processes (or two instances in one process) SERIALIZE — the
    * lost-update window where both load the same spend and both write
    * is closed, and the second charge over budget is rejected with the
    * usual named error instead of silently double-spending.
    */
  final class EpsilonLedger(
      val budget: Double, val path: Option[String] = None) {
    require(budget > 0, s"budget must be positive, got $budget")
    path.foreach(p => new java.io.File(p).mkdirs(): Unit)
    private val memSpent = scala.collection.mutable.Map.empty[String, Double]
    private def ledgerFile = new java.io.File(path.get, "LEDGER")

    /** Serialize a durable read-check-write against every other writer
      * (the shared [[graft.operators.ManifestTable.withFileLock]]
      * cross-process + in-JVM exclusion). In-memory ledgers skip it —
      * the instance `synchronized` in [[charge]] already covers them.
      */
    private def withLedgerLock[T](body: => T): T = path match {
      case None => body
      case Some(p) =>
        graft.operators.ManifestTable.withFileLock(p, "LEDGER_LOCK")(body)
    }

    /** Current per-dataset spends — the durable file when backed, the
      * in-memory map otherwise. Doubles round-trip via the shortest
      * string repr (exact parse-back).
      */
    private def load(): Map[String, Double] = path match {
      case None => memSpent.toMap
      case Some(_) =>
        if (!ledgerFile.exists()) Map.empty
        else new String(
          java.nio.file.Files.readAllBytes(ledgerFile.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
          .split('\n').filter(_.nonEmpty)
          .map { l =>
            val i = l.lastIndexOf('\t')
            l.substring(0, i) -> l.substring(i + 1).toDouble
          }.toMap
    }

    private def store(m: Map[String, Double]): Unit = path match {
      case None =>
        memSpent.clear(); memSpent ++= m: Unit
      case Some(p) =>
        val tmp = new java.io.File(p, "LEDGER.tmp")
        java.nio.file.Files.write(tmp.toPath,
          m.toSeq.sorted.map { case (k, v) => s"$k\t$v" }.mkString("\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.move(tmp.toPath, ledgerFile.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }

    /** Record an ε-spend against `dataset`; throws when the cumulative
      * spend would exceed the budget. Durable-backed ledgers re-read
      * the file on every charge, so a restart (or a second instance on
      * the same path) can never slip past spends it didn't make.
      */
    def charge(dataset: String, epsilon: Double): Unit = {
      require(epsilon > 0, s"epsilon must be positive, got $epsilon")
      require(!dataset.contains('\n') && !dataset.contains('\t'),
        "dataset keys must not contain tab/newline (ledger-file delimiters)")
      def chargeLocked(): Unit = {
        val all = load()
        val s = all.getOrElse(dataset, 0.0)
        require(s + epsilon <= budget + 1e-12,
          f"epsilon budget exceeded for '$dataset': spent $s%.6g + " +
            f"requested $epsilon%.6g > budget $budget%.6g")
        store(all.updated(dataset, s + epsilon))
      }
      path match {
        // in-memory: the instance monitor is the only exclusion needed
        case None => synchronized(chargeLocked())
        // durable: the cross-process file lock already serializes both
        // processes AND in-JVM threads (withFileLock's path monitor) —
        // taking the instance monitor around the BLOCKING OS lock would
        // stall spent()/remaining() for as long as a foreign process
        // holds the ledger (advice r17)
        case Some(_) => withLedgerLock(chargeLocked())
      }
    }

    def spent(dataset: String): Double = path match {
      case None => synchronized(load().getOrElse(dataset, 0.0))
      // durable stores are temp-file + atomic-rename writes: a read can
      // never see a torn file, so probes stay lock-free and never stall
      // behind another process's in-flight charge
      case Some(_) => load().getOrElse(dataset, 0.0)
    }
    def remaining(dataset: String): Double = budget - spent(dataset)
  }


  /** ε-DP noisy group counts (sensitivity 1, Laplace b = 1/ε): one hash
    * aggregate, then map-side noise — the exact count never leaves the
    * plan. `suppressBelow` drops groups whose NOISY count falls under a
    * publication floor (thresholding on the released value is
    * DP-safe post-processing).
    */
  def dpCounts(
      df: DataFrame, groupCols: Seq[String], epsilon: Double, seed: String,
      suppressBelow: Long = Long.MinValue): DataFrame = {
    require(groupCols.nonEmpty, "dpCounts needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .withColumn("released",
        col("_n") + laplaceNoise(seed, "count", 1.0 / epsilon, key))
      .where(col("released") >= suppressBelow)
      .drop("_n")
  }

  /** ε-DP noisy sum of an INTEGER measure clamped to [lo, hi]
    * (sensitivity max(|lo|, |hi|), Laplace b = Δ/ε). The clamp is part
    * of the mechanism — without it one row could move the sum
    * unboundedly — and the integer domain keeps the exact sum
    * order-independent (a double sum would be merge-order-dependent
    * and unreplayable).
    */
  def dpSum(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Long, hi: Long, epsilon: Double, seed: String): DataFrame = {
    require(groupCols.nonEmpty, "dpSum needs at least one group column")
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val sensitivity = math.max(math.abs(lo), math.abs(hi))
    require(sensitivity > 0, "a [0, 0] clamp releases nothing")
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val clamped = least(greatest(col(valueCol).cast("long"), lit(lo)), lit(hi))
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(clamped).as("_s"))
      .withColumn("released",
        col("_s") +
          laplaceNoise(seed, "sum", sensitivity.toDouble / epsilon, key))
      .drop("_s")
  }

  /** ε-DP noisy WINDOWED group counts — the streaming-release shape
    * (each window's publication is one release; the window start is
    * folded into the noise key so every window draws fresh noise). The
    * expression tree is identical to [[dpCounts]]' and stream-safe: one
    * windowed aggregate, then map-side noise — usable verbatim under
    * `groupBy(window(...))` in Structured Streaming
    * ([[graft.streaming.StreamingPipeline.dpCountStream]]). Composition
    * caveat: releasing EVERY window over the same users still composes —
    * charge the ledger per window.
    */
  def dpWindowedCountsColumn(
      seed: String, epsilon: Double, groupKey: Column,
      windowStart: Column, n: Column): Column = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val key = concat_ws("|", groupKey.cast("string"),
      windowStart.cast("long").cast("string"))
    n + laplaceNoise(seed, "count", 1.0 / epsilon, key)
  }
}
