package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Queries.QDef
import graft.functions.{Dedup, Text}
import graft.operators.Sessions

/** EXT-tier query registry: the LLM-data-pipeline operators grounded in the
  * `documents` / `events` / `embeddings` tables (SURVEY §2.5 end, §7.2
  * item 5). Oracle SQL mirrors each Catalyst expression 1:1 in DuckDB
  * dialect (list_* higher-order functions ↔ Spark array HOFs).
  */
object Ext {

  import Tables._

  /** Gap-based sessionization over events (30-min gap). */
  private val sessionize = QDef(
    "sessionize",
    (s, d) => Sessions.sessionize(events(s, d)),
    Some(
      """SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        | min(ts) AS session_start, max(ts) AS session_end,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        | SELECT user_id, ts, value,
        |  sum(_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS session_id
        | FROM (
        |  SELECT user_id, ts, event_id, value,
        |   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |     OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          + INTERVAL 30 MINUTE
        |    THEN 1 ELSE 0 END AS _new
        |  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |        FROM events)) )
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin.replace('\n', ' ')
    )
  )

  /** Per-document text statistics. */
  private val textStats = QDef(
    "text_stats",
    (s, d) => Text.textStats(documents(s, d)).orderBy(col("doc_id")),
    Some(
      """SELECT doc_id,
        | CAST(length(text) AS INT) AS n_chars2,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq_tokens,
        | CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS BIGINT) AS sum_token_len,
        | CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS DOUBLE)
        |   / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin.replace('\n', ' ')
    )
  )

  /** Whitespace + BPE-ish regex token counts. */
  private val tokenCount = QDef(
    "token_count",
    (s, d) => Text.tokenCounts(documents(s, d)).orderBy(col("doc_id")),
    Some(
      ("SELECT doc_id, " +
        "CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens, " +
        s"CAST(len(regexp_extract_all(text, '${Text.bpeishPattern}')) AS INT) AS n_bpeish_tokens " +
        "FROM documents ORDER BY doc_id")
    )
  )

  private def markerSql(name: String, markers: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> t IN (" +
      markers.map(m => s"'$m'").mkString(", ") + s"))) AS $name"

  /** Marker-token language ID (argmax, fixed tie order en>de>es>fr). */
  private val langIdQ = QDef(
    "lang_id",
    (s, d) => Text.langId(documents(s, d)).orderBy(col("doc_id")),
    Some(
      ("WITH m AS (SELECT doc_id, lang, " +
        markerSql("mk_en", Text.langMarkers(0)._2) + ", " +
        markerSql("mk_de", Text.langMarkers(1)._2) + ", " +
        markerSql("mk_es", Text.langMarkers(2)._2) + ", " +
        markerSql("mk_fr", Text.langMarkers(3)._2) +
        " FROM documents) " +
        "SELECT doc_id, lang, " +
        "CASE WHEN mk_en >= mk_de AND mk_en >= mk_es AND mk_en >= mk_fr AND mk_en > 0 THEN 'en' " +
        "WHEN mk_de >= mk_es AND mk_de >= mk_fr AND mk_de > 0 THEN 'de' " +
        "WHEN mk_es >= mk_fr AND mk_es > 0 THEN 'es' " +
        "WHEN mk_fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred " +
        "FROM m ORDER BY doc_id")
    )
  )

  /** Heuristic quality score. */
  private val qualityScore = QDef(
    "quality_score",
    (s, d) => Text.qualityScore(documents(s, d)).orderBy(col("doc_id")),
    Some(
      ("WITH m AS (SELECT doc_id, " +
        "CAST(len(list_filter(string_split(text, ' '), t -> t IN (" +
        Text.stopwords.map(w => s"'$w'").mkString(", ") + "))) AS DOUBLE) " +
        " / len(string_split(text, ' ')) AS stop_ratio, " +
        "CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) " +
        " / length(text) AS alpha_ratio, " +
        "least(CAST(len(string_split(text, ' ')) AS DOUBLE) / CAST(200.0 AS DOUBLE), " +
        " CAST(1.0 AS DOUBLE)) AS len_score FROM documents) " +
        "SELECT doc_id, stop_ratio, alpha_ratio, len_score, " +
        "stop_ratio * CAST(0.5 AS DOUBLE) + alpha_ratio * CAST(0.3 AS DOUBLE) " +
        " + len_score * CAST(0.2 AS DOUBLE) AS quality " +
        "FROM m ORDER BY doc_id")
    )
  )

  /** Bag-of-words canonical fingerprint. */
  private val fingerprintQ = QDef(
    "fingerprint",
    (s, d) => Text.fingerprint(documents(s, d)).orderBy(col("doc_id")),
    Some(
      "SELECT doc_id, md5(array_to_string(list_sort(list_distinct(" +
        "string_split(text, ' '))), ' ')) AS fp FROM documents ORDER BY doc_id"
    )
  )

  /** Exact dedup groups on normalized content hash. */
  private val dedupExact = QDef(
    "dedup_exact",
    (s, d) => Dedup.exactGroups(documents(s, d)),
    Some(
      "SELECT md5(lower(trim(text))) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id, " +
        "CAST(count(*) AS BIGINT) AS n_dups FROM documents " +
        "GROUP BY md5(lower(trim(text))) ORDER BY h"
    )
  )

  val all: Seq[QDef] = Seq(
    sessionize, textStats, tokenCount, langIdQ, qualityScore, fingerprintQ,
    dedupExact
  )
}
