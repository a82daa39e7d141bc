package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.ext.Privacy
import graft.operators.ManifestTable

/** Optimistic-concurrency commits (round-17): two racing committers on
  * one manifest table — exactly one wins, the loser throws the named
  * [[ManifestTable.ConcurrentCommitException]] with its snapshot and
  * version file cleaned up; the durable epsilon ledger's charge lock
  * closes the cross-instance lost-update window; the relative-path
  * `_stats` sidecar survives moving the whole table directory.
  */
class ManifestConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/table"

  test("two interleaved committers: exactly one wins, loser fails loudly, nothing leaked") {
    val dir = tmpTable("graft_occ_")
    ManifestTable.commit(Seq((1L, "v0")).toDF("k", "v"), dir, batchId = 0L)

    // Committer A's snapshot write BLOCKS inside the (unlocked) data
    // write until committer B has fully committed — the deterministic
    // staging of "pointer moved between commit start and the swing".
    CommitGate.reset()
    val dfA = spark.range(0, 4, 1, 1).as[Long].mapPartitions { it =>
      CommitGate.started.countDown()
      CommitGate.go.await(60, TimeUnit.SECONDS)
      it
    }.toDF("k").withColumn("v", lit("from-A"))

    @volatile var aFailure: Throwable = null
    val a = new Thread(() => {
      try ManifestTable.commit(dfA, dir, batchId = 1L)
      catch { case t: Throwable => aFailure = t }
    })
    a.start()
    assert(CommitGate.started.await(60, TimeUnit.SECONDS),
      "committer A never reached its snapshot write")

    // B commits while A is mid-snapshot — B must win cleanly
    ManifestTable.commit(
      Seq((2L, "from-B")).toDF("k", "v"), dir, batchId = 2L)
    CommitGate.go.countDown()
    a.join(120000)
    assert(!a.isAlive, "committer A wedged")

    // exactly one winner: A threw the NAMED error...
    assert(aFailure != null, "losing committer did not throw")
    assert(aFailure.isInstanceOf[ManifestTable.ConcurrentCommitException],
      s"expected ConcurrentCommitException, got $aFailure")
    // ...and the committed table is B's, not A's and not a torn mix
    val served = ManifestTable.read(spark, dir).get
      .as[(Long, String)].collect().toSet
    assert(served === Set((2L, "from-B")), s"lost/torn snapshot: $served")
    // nothing leaked: only the retained snapshots/versions remain —
    // A's orphan snapshot and version file were cleaned before the throw
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(files.count(_.startsWith("snap-")) === 2, s"leaked snapshot in $files")
    assert(files.count(_.startsWith("ver-")) === 2, s"leaked version in $files")
    // and the loser is RETRYABLE: a fresh commit of A's data now lands
    ManifestTable.commit(
      Seq((3L, "from-A-retry")).toDF("k", "v"), dir, batchId = 3L)
    assert(ManifestTable.read(spark, dir).get
      .as[(Long, String)].collect().toSet === Set((3L, "from-A-retry")))
  }

  test("gc shields a racing committer's in-flight snapshot behind its marker") {
    val dir = tmpTable("graft_occ_inflight_")
    ManifestTable.commit(Seq((1L, "v0")).toDF("k", "v"), dir, batchId = 0L)
    // stage a racing attempt's in-flight state: a half-written snapshot
    // dir with a FRESH .inflight marker (exactly what writeSnapshot
    // creates before the unlocked parquet write begins)
    val attempt = new java.io.File(dir, "snap-000000007-aaaaaaaa")
    attempt.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(attempt, "part-half-written.parquet").toPath,
      Array[Byte](1, 2, 3))
    val marker = new java.io.File(dir, attempt.getName + ".inflight")
    java.nio.file.Files.createFile(marker.toPath)
    // a winner committing with retainMs = 0 must NOT reclaim it
    ManifestTable.commit(Seq((1L, "v1")).toDF("k", "v"), dir, batchId = 1L)
    assert(attempt.exists(),
      "in-flight attempt reclaimed from under its racing committer")
    val old = System.currentTimeMillis() - ManifestTable.InflightGraceMs - 1000L
    def ageTree(f: java.io.File): Unit = {
      f.setLastModified(old): Unit
      if (f.isDirectory) f.listFiles().foreach(ageTree)
    }
    // an aged marker alone is NOT proof of death: while the attempt's
    // tree shows recent writes (a data write can outlive the grace),
    // the shield must hold (review r18)
    marker.setLastModified(old): Unit
    ManifestTable.commit(Seq((1L, "v1b")).toDF("k", "v"), dir, batchId = 2L)
    assert(attempt.exists(),
      "long-running attempt reclaimed despite fresh writes in its tree")
    // once the marker AND the whole tree age past the grace window the
    // attempt is a crashed orphan: dir and marker reclaimed together
    marker.setLastModified(old): Unit
    ageTree(attempt)
    ManifestTable.commit(Seq((1L, "v2")).toDF("k", "v"), dir, batchId = 3L)
    assert(!attempt.exists(), "crashed attempt not reclaimed after the grace")
    assert(!marker.exists(), "stale inflight marker leaked")
  }

  test("durable epsilon ledger: concurrent chargers serialize, budget never oversubscribed") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ledger_occ_").toString
    // two INSTANCES on one path, hammered from two threads: with the
    // charge lock every read-check-write serializes, so exactly
    // budget/step charges succeed across both and the file never
    // records more than the budget
    val l1 = new Privacy.EpsilonLedger(budget = 1.0, path = Some(dir))
    val l2 = new Privacy.EpsilonLedger(budget = 1.0, path = Some(dir))
    val ok = new java.util.concurrent.atomic.AtomicInteger(0)
    val rejected = new java.util.concurrent.atomic.AtomicInteger(0)
    def hammer(l: Privacy.EpsilonLedger) = new Thread(() =>
      (1 to 10).foreach { _ =>
        try { l.charge("ds", 0.1); ok.incrementAndGet(): Unit }
        catch { case _: IllegalArgumentException => rejected.incrementAndGet(): Unit }
      })
    val ts = Seq(hammer(l1), hammer(l2))
    ts.foreach(_.start()); ts.foreach(_.join(60000))
    assert(ok.get === 10, s"charges accepted: ${ok.get} (budget 1.0 / 0.1)")
    assert(rejected.get === 10)
    assert(math.abs(l1.spent("ds") - 1.0) < 1e-9)
    // a third instance reads the same durable truth and rejects too
    val l3 = new Privacy.EpsilonLedger(budget = 1.0, path = Some(dir))
    intercept[IllegalArgumentException](l3.charge("ds", 0.1))
  }

  test("stats sidecar survives moving the table directory (relative paths)") {
    val root = java.nio.file.Files.createTempDirectory("graft_stats_move_")
    val dirA = root.toString + "/tableA"
    val df = (0L until 100L).map(i => (i, s"r$i")).toDF("k", "v")
      .repartitionByRange(4, col("k"))
    ManifestTable.commit(df, dirA, batchId = 0L, statsCols = Seq("k"))
    val (filesA, totalA) = ManifestTable
      .pruneFiles(spark, dirA, "k", Some(0L), Some(10L)).get
    assert(totalA === 4 && filesA.size < totalA, "stats did not prune")
    // move the WHOLE table — the advice-r16 failure mode for absolute paths
    val dirB = root.toString + "/tableB"
    assert(new java.io.File(dirA).renameTo(new java.io.File(dirB)))
    val (filesB, totalB) = ManifestTable
      .pruneFiles(spark, dirB, "k", Some(0L), Some(10L)).get
    assert(totalB === 4 && filesB.size === filesA.size)
    assert(filesB.forall(_.startsWith(dirB)), s"stale locations: $filesB")
    val scanned = ManifestTable
      .scanWithPredicate(spark, dirB, "k", Some(0L), Some(10L)).get
    assert(scanned.count() === 11)
    assert(scanned.agg(min("k"), max("k")).as[(Long, Long)].head() === ((0L, 10L)))
  }
}

/** Latches staging the commit race (static so the task closure reaches
  * them in local mode).
  */
object CommitGate {
  @volatile var started: CountDownLatch = _
  @volatile var go: CountDownLatch = _
  def reset(): Unit = { started = new CountDownLatch(1); go = new CountDownLatch(1) }
}
