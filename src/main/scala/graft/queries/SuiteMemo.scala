package graft.queries

/** Suite-level memo of persisted-index artifacts, keyed on (session
  * identity, testdata dir, build tag) — the [[GraphAnnQueries]]
  * IndexMemo (verdict r18 #2, advice r19 lazy-cell form) generalized
  * for every index family (optimization r20).
  *
  * Several gate queries exercise DIFFERENT operators over the SAME
  * frozen index artifact: q_index_health / q_index_rebuild_due both
  * gauge the 32-list IVF index of the % 7 corpus, and q_dedup_inc_sem /
  * q_index_health_sem / q_index_rebuild_due_sem all screen or gauge the
  * k-means semantic index of the vec_id < 250 corpus. In a deployment
  * those are artifacts built ONCE offline and served to every consumer;
  * in-suite the memo plays that role — the first consumer pays the
  * build (localCheckpoint-pinned so later consumers replay nothing),
  * and every gate's OUTPUT is byte-identical to its self-contained form
  * because the builders are deterministic functions of the parquet
  * input. Keyed on applicationId so a fresh session rebuilds rather
  * than touching another context's dead checkpoint blocks; per-key lazy
  * cells so distinct keys build concurrently and a cache hit never
  * waits on another key's running build.
  */
private[queries] object SuiteMemo {
  private final class Cell(
      val session: org.apache.spark.sql.SparkSession,
      build: () => org.apache.spark.sql.DataFrame) {
    lazy val df: org.apache.spark.sql.DataFrame =
      build().localCheckpoint(true)
  }
  private val m = scala.collection.mutable.Map.empty[
    (String, String, String), Cell]

  def apply(s: org.apache.spark.sql.SparkSession, d: String, tag: String)(
      build: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cell = synchronized {
      // applicationId is unique per context (identityHashCode can be
      // reused after GC and would hand a new context another context's
      // dead checkpoint blocks — review r19); entries of stopped
      // contexts are dropped eagerly so the memo never outlives them.
      m.filterInPlace((_, c) => !c.session.sparkContext.isStopped)
      m.getOrElseUpdate((s.sparkContext.applicationId, d, tag),
        new Cell(s, () => build))
    }
    cell.df
  }
}
