package graft.model

import java.sql.Timestamp

/** Canonical input row (BASELINE.json input_hint; reference corpus analog
  * ocr_combined.py:232-246 — a keyed collection of binary documents). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String, // nullable: pre-existing extracted text ("already has OCR", ocr_combined.py:219-222)
    lang: String
)

/** Extracted output row (reference sidecar text + hOCR spans, ocr_combined.py:193-199). */
final case class ExtractedRow(
    url: String,
    warc_ts: Timestamp,
    lang: String,
    bucket: Int, // stable logical partition: pmod(xxhash64(url), nBuckets)
    status: String, // extracted | skipped | error
    error_class: String, // null unless status=error (error_handler.py:305-325 analog)
    text: String,
    text_sha256: String,
    n_chars: Int
)

/** Per-(run,bucket) lineage row — the checkpoint-resume unit
  * (reference OCRFile/OCRJob store, database_manager.py:42-119). */
final case class LineageRow(
    run_id: String,
    bucket: Int,
    row_count: Long,
    ok_count: Long,
    skipped_count: Long,
    err_count: Long, // rows whose extraction failed (status=error)
    digest: String, // sha256 over sorted per-url text digests in the bucket
    status: String, // committed
    committed_utc_ms: Long // monotonic commit stamp; latest-per-bucket orders by this
)

/** Quarantine row (security_validator.py:309-335 quarantine analog). */
final case class QuarantineRow(
    url: String,
    reasons: Seq[String],
    risk: String,
    payload_sha256: String
)

/** Append-only audit event (reference AuditLog table,
  * database_manager.py:122-150): one row per run lifecycle event. */
final case class AuditRow(
    run_id: String,
    seq: Int, // per-run monotonic sequence
    ts_utc_ms: Long,
    event_type: String, // run_start | resume | group_commit | batch_too_large | run_complete
    severity: String, // info | warning | error
    message: String
)

/** Run-level job record (reference OCRJob, database_manager.py:42-84). */
final case class JobRow(
    run_id: String,
    mode: String,
    total_rows: Long,
    extracted: Long,
    skipped: Long,
    errors: Long, // per-row extraction failures (kept in output with error_class)
    quarantined: Long,
    wall_sec: Double,
    docs_per_sec: Double,
    status: String
)
