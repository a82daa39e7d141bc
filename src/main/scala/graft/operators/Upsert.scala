package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Keyed upsert (SCD-1 merge): the warehouse MERGE primitive expressed as
  * a plain relational plan — update rows REPLACE base rows with the same
  * key, unmatched update rows are inserts, untouched base rows pass
  * through. No table format required: the result is a DataFrame the
  * caller writes wherever the base lived.
  */
object Upsert {

  /** `updates ∪ (base ⟕̸ updates)` — every key appears once per side, so
    * the merged frame holds the updated row where keys collide and both
    * sides' unmatched rows otherwise.
    *
    * Preconditions: both sides share a schema; `updates` is key-unique
    * (two updates for one key would BOTH survive — dedup upstream with
    * keep-last, the same [[graft.etl.Cleaning]] primitive the pipeline
    * uses).
    *
    * Scale shape: the common case is a SMALL change set against a HUGE
    * base (a day's mutations vs years of history) — `broadcastUpdates`
    * (default) broadcasts only the update KEYS into the anti join, so the
    * base never shuffles; the union is shuffle-free. With
    * `broadcastUpdates = false` the anti join shuffles both sides on the
    * key — the right call when the change set is itself huge.
    */
  def upsert(
      base: DataFrame, updates: DataFrame, key: String,
      broadcastUpdates: Boolean = true): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schema mismatch: base ${base.columns.mkString(",")} vs " +
        s"updates ${updates.columns.mkString(",")}")
    val keys = updates.select(key)
    val untouched = base.join(
      if (broadcastUpdates) broadcast(keys) else keys, Seq(key), "left_anti")
    updates.unionByName(untouched)
  }
}
