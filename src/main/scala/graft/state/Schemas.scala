package graft.state

import java.sql.Timestamp

/** Control-table row types (SURVEY §1.1), the Spark analogue of the
  * reference's `%ROWTYPE` anchoring (spec:20-21): every lifecycle operator
  * binds to these case classes / their encoder-derived StructTypes, so the
  * schema is declared once and checked at compile time.
  *
  * Columns mirror what the reference actually reads/writes:
  *  - batch_master: body:133-143 (SELECT *), 161, 264-267, 499, 514-517
  *  - batch_monitor: body:194-212 (full INSERT list), 438-446, 457-466
  *  - batch_dependency: body:258-261
  *  - batch_log: body:6-10, 350, 928-930
  *  - envvar: body:353, 1036-1039
  *  - tmp_run_batch: body:999-1002
  */
final case class BatchMaster(
    module_id: Long,
    module_name: String,
    run_level: Long,
    sub_system: Option[String],
    disabled_date: Option[Timestamp])

/** One event in the append-only batch_monitor log (S5/X1/X2 redesign).
  *
  * The reference mutates monitor rows in place under autonomous
  * transactions (body:192, 438-466); immutable storage replaces that with
  * an event per status change. `run_key` identifies one run across its
  * WAITING → RUNNING → terminal transitions (the reference identifies the
  * row by (module_id, run_date, run_id, parameters) and *rewrites* those
  * fields on the WAITING→RUNNING update, body:430-444 — a surrogate key is
  * the honest version of that); `event_seq` is the event-sourcing order,
  * and the current state of a run is its highest-seq event (W1 view).
  */
final case class MonitorEvent(
    run_key: String,
    event_seq: Long,
    module_id: Long,
    run_date: Timestamp,
    run_id: Long,
    parameters: Option[String],
    audit_id: Option[String],
    run_status: String,
    sub_system: Option[String],
    exclusive_run_yn: Option[String],
    control_date: Option[Timestamp],
    end_time: Option[Timestamp],
    records_processed: Option[Long],
    records_in_error: Option[Long])

final case class BatchDependency(
    parent_module_id: Long,
    child_id: Long,
    dependency_type: String)

/** Append-only batch_log record (7-day retention, body:926-939). */
final case class BatchLogRec(
    run_date: Timestamp,
    procedure_name: String,
    statement_num: Long,
    package_name: String,
    batch_name: Option[String],
    message: Option[String])

/** Event-sourced envvar store (body:861-875): current value of a variable
  * is its highest-seq event. */
final case class EnvVarEvent(
    variable_name: String,
    value: String,
    event_seq: Long)

final case class RunCommand(batch_name: String, run_command: String)

/** SQL*Loader file-name manifest (body:1174-1197). */
final case class TmpRunLoader(batch_name: String, file_name: String, file_seq: Long)

/** Email directory (body:1059-1067). */
final case class MailAddr(stf_id: String, forename: String, name: String)

/** Mail audit sink — the reference's dbmail.send_mail_audit append
  * (body:1136-1148), an S4 autonomous append like the monitor events. */
final case class MailAudit(
    send_date: Timestamp,
    sender: String,
    recipient: String,
    copied: Option[String],
    blind_copied: Option[String],
    subject: String)
