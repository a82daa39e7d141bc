package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.LogTemplates

/** Log-template mining gate queries — the generative dual-model oracle:
  * both engines synthesize IDENTICAL raw log messages from the events
  * table (five format strings keyed by event_type, with real variable
  * fields: ids, derived IPv4s, md5 hex runs, md5 UUIDs), then Spark
  * runs the REAL masking chain ([[graft.ext.LogTemplates.templateOf]] —
  * the ordered regexp_replace pipeline) while DuckDB never executes a
  * regex: it maps each event_type to the EXPECTED template literal. Any
  * masking defect — wrong pattern, wrong placeholder, wrong chain order
  * (UUID/HEX, IP/NUM, HEX/NUM) — yields a different template string on
  * the Spark side and breaks the hash compare.
  */
object TemplateQueries {

  /** value feeds the <NUM> field of every format string, so a NULL value
    * would NULL the whole synthesized message on the Spark side while
    * the oracle's event_type-keyed template literal would still count
    * the row (advice r14) — filter it symmetrically in BOTH engines.
    */
  private def events(s: SparkSession, d: String): DataFrame =
    QueryDef.eventsTable(s, d)
      .where(col("user_id").isNotNull && col("value").isNotNull)
      .withColumn("tu", expr("ts div 1000"))

  /** The variable fields, shared by every format string. */
  private val NumE = "CAST(floor(value * 100) AS BIGINT)"
  private val IpE =
    "concat('10.', event_id % 256, '.', (event_id div 256) % 256, '.', (event_id div 65536) % 256)"
  private val HexE = "substring(md5(CAST(event_id AS STRING)), 1, 12)"
  private val UuidE =
    "concat(substring(md5(concat('u', event_id)), 1, 8), '-', substring(md5(concat('u', event_id)), 9, 4), '-', substring(md5(concat('u', event_id)), 13, 4), '-', substring(md5(concat('u', event_id)), 17, 4), '-', substring(md5(concat('u', event_id)), 21, 12))"

  /** The five format strings (Spark side). */
  private val BaseMsgE =
    s"""CASE event_type
        WHEN 'signup' THEN concat('new account ', $UuidE, ' for user ', user_id, ' from ', $IpE)
        WHEN 'error' THEN concat('ERR ', $NumE, ' for user ', user_id, ' trace ', $HexE)
        WHEN 'click' THEN concat('user ', user_id, ' clicked item ', $NumE, ' session ', $UuidE)
        WHEN 'view' THEN concat('user ', user_id, ' viewed /p/', $NumE)
        WHEN 'purchase' THEN concat('user ', user_id, ' purchased order ', $NumE, ' from ', $IpE)
        ELSE concat(event_type, ' event ', $NumE, ' user ', user_id) END"""

  // ---- oracle fragments (DuckDB) — each emitted on ONE line ----------
  private val ONum = "CAST(floor(value * 100) AS BIGINT)"
  private val OIp =
    "('10.' || (event_id % 256) || '.' || ((event_id // 256) % 256) || '.' || ((event_id // 65536) % 256))"
  private val OHex = "substr(md5(event_id::VARCHAR), 1, 12)"
  private val OUuid =
    "(substr(md5('u' || event_id), 1, 8) || '-' || substr(md5('u' || event_id), 9, 4) || '-' || substr(md5('u' || event_id), 13, 4) || '-' || substr(md5('u' || event_id), 17, 4) || '-' || substr(md5('u' || event_id), 21, 12))"

  private val OBaseMsg =
    s"CASE event_type WHEN 'signup' THEN 'new account ' || $OUuid || ' for user ' || user_id || ' from ' || $OIp WHEN 'error' THEN 'ERR ' || $ONum || ' for user ' || user_id || ' trace ' || $OHex WHEN 'click' THEN 'user ' || user_id || ' clicked item ' || $ONum || ' session ' || $OUuid WHEN 'view' THEN 'user ' || user_id || ' viewed /p/' || $ONum WHEN 'purchase' THEN 'user ' || user_id || ' purchased order ' || $ONum || ' from ' || $OIp ELSE event_type || ' event ' || $ONum || ' user ' || user_id END"

  /** The oracle's EXPECTED template per event_type — never a regex. */
  private val OBaseTemplate =
    s"CASE event_type WHEN 'signup' THEN 'new account <UUID> for user <NUM> from <IP>' WHEN 'error' THEN 'ERR <NUM> for user <NUM> trace <HEX>' WHEN 'click' THEN 'user <NUM> clicked item <NUM> session <UUID>' WHEN 'view' THEN 'user <NUM> viewed /p/<NUM>' WHEN 'purchase' THEN 'user <NUM> purchased order <NUM> from <IP>' ELSE event_type || ' event <NUM> user <NUM>' END"

  /** Template census over the synthesized log: the real masking chain
    * + one tiny-domain hash aggregate vs the oracle's literal map.
    */
  val qLogTemplates = QueryDef(
    "q_log_templates",
    (s, d) => {
      val synth = events(s, d).withColumn("message", expr(BaseMsgE))
      LogTemplates.mine(synth, "message", "tu").orderBy("template")
    },
    Some(s"""WITH m AS (
            |  SELECT $OBaseTemplate AS template,
            |         $OBaseMsg AS msg,
            |         epoch_us(ts) AS tu
            |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL)
            |SELECT template, count(*) AS n_events,
            |       min(tu) AS first_us, max(tu) AS last_us,
            |       min(msg) AS example
            |FROM m GROUP BY template ORDER BY template""".stripMargin))

  /** Novel-template detection with a PLANTED late-only pattern: events
    * in the trailing fifth of the time range with event_id ≡ 7 (mod 50)
    * switch to a breach format string that exists nowhere earlier —
    * [[graft.ext.LogTemplates.novelTemplates]] must surface exactly the
    * templates first seen past the cutoff. The cutoff derives from one
    * global min/max aggregate in BOTH engines (exact integer
    * arithmetic), so the plant is replayable at every sf.
    */
  val qTemplateNovelty = QueryDef(
    "q_template_novelty",
    (s, d) => {
      val base = events(s, d)
      val bounds = base.agg(min(col("tu")).as("_lo"), max(col("tu")).as("_hi"))
      val synth = base.crossJoin(broadcast(bounds))
        .withColumn("_cutoff", expr("_hi - (_hi - _lo) div 5"))
        .withColumn("message",
          when(col("tu") > col("_cutoff") &&
              pmod(col("event_id"), lit(50)) === 7,
            expr(s"concat('breach detected host ', $IpE, ' sig ', $HexE)"))
            .otherwise(expr(BaseMsgE)))
      LogTemplates.novelTemplates(synth, "message", "tu", lastFracInv = 5)
        .orderBy("template")
    },
    Some(s"""WITH b AS (
            |  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
            |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
            |m AS (
            |  SELECT CASE WHEN epoch_us(ts) > hi - (hi - lo) // 5
            |                   AND event_id % 50 = 7
            |              THEN 'breach detected host <IP> sig <HEX>'
            |              ELSE $OBaseTemplate END AS template,
            |         CASE WHEN epoch_us(ts) > hi - (hi - lo) // 5
            |                   AND event_id % 50 = 7
            |              THEN 'breach detected host ' || $OIp || ' sig ' || $OHex
            |              ELSE $OBaseMsg END AS msg,
            |         epoch_us(ts) AS tu,
            |         hi - (hi - lo) // 5 AS cutoff
            |  FROM events, b WHERE user_id IS NOT NULL AND value IS NOT NULL)
            |SELECT template, count(*) AS n_events,
            |       min(tu) AS first_us, max(tu) AS last_us,
            |       min(msg) AS example
            |FROM m GROUP BY template, cutoff
            |HAVING min(tu) > cutoff
            |ORDER BY template""".stripMargin))

  val all: Seq[QueryDef] = Seq(qLogTemplates, qTemplateNovelty)
}
