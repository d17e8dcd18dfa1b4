package graft.lifecycle

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.state.{ControlStore, MailAudit}

/** S8 notifier interface: what the reference does over UTL_SMTP
  * (body:1080-1132). Transport is pluggable because WHERE mail goes is
  * deployment policy; the engine ships a REAL RFC 5321 client binding —
  * [[graft.lifecycle.Smtp.SmtpNotifier]], protocol-tested against the
  * in-repo loopback server with fault injection (MailerLoaderSpec) —
  * plus the recorder for policy-only tests. Production points the SMTP
  * binding at its relay host; the zero-egress sandbox points it at
  * 127.0.0.1.
  */
trait Notifier {
  def send(sender: String, recipients: Seq[String], subject: String, body: String): Unit
}

/** Default zero-egress notifier: records what would have been sent. */
final class RecordingNotifier extends Notifier {
  final case class Sent(sender: String, recipients: Seq[String], subject: String, body: String)
  val sent = ArrayBuffer.empty[Sent]
  override def send(sender: String, recipients: Seq[String], subject: String, body: String): Unit =
    sent += Sent(sender, recipients, subject, body)
}

/** proc_send_mail_group (body:1011-1161) re-expressed over the control
  * store + a pluggable [[Notifier]]:
  *
  *  - SEND_MAIL env ≠ 'Y' → no-op (body:1041-1043; also the safe default
  *    when the variable is unset — the reference would raise NO_DATA_FOUND
  *    from a missing envvar row, which in a zero-egress engine is the
  *    wrong failure mode for "mail was never configured").
  *  - SEND_MAIL_TEST = 'Y' → reroute to the configured test recipient
  *    (body:1069-1074; the reference hard-codes a developer address).
  *  - Sender = INITCAP(forename).INITCAP(name)@domain from
  *    mail_addr_lookup keyed by the session user's staff id
  *    (body:1055-1078).
  *  - Recipient string is space-delimited; the reference's INSTR walk
  *    (body:1084-1128) emits the trimmed fields — i.e. split on spaces
  *    and drop empties.
  *  - SEND_MAIL_AUD = 'Y' → append the audit row (S4 append sink,
  *    body:1134-1149).
  */
class Mailer(
    store: ControlStore,
    notifier: Notifier,
    clock: Clock = SystemClock,
    user: String = "OPS$BATCH",
    domain: String = "example.com",
    testRecipient: String = "test.override@example.com",
    log: String => Unit = _ => ()) {

  /** Oracle INITCAP: first letter of EVERY word uppercased (word
    * boundaries = non-alphanumerics), the rest lowered — "jean-luc" →
    * "Jean-Luc", "van der berg" → "Van Der Berg". Capitalizing only the
    * first character would emit different sender addresses than the
    * reference's audit rows for any multi-word or hyphenated name. */
  private def initcap(s: String): String = {
    val sb = new StringBuilder(s.length)
    var boundary = true
    s.foreach { c =>
      val alnum = c.isLetterOrDigit
      sb += (if (alnum && boundary) c.toUpper else if (alnum) c.toLower else c)
      boundary = !alnum
    }
    sb.toString
  }

  /** UPPER(SUBSTR(USER, 5)) — staff id after the 'OPS$' prefix (body:1055-1057). */
  private[lifecycle] def staffId: String = user.drop(4).toUpperCase

  def sendMailGroup(recipient: String, subject: String, body: String): Boolean = {
    if (!store.getEnv("SEND_MAIL").contains("Y")) {
      log("PROC_SEND_MAIL is Turned Off")
      return false
    }
    val overrideTest = store.getEnv("SEND_MAIL_TEST").contains("Y")
    val auditOn = store.getEnv("SEND_MAIL_AUD").contains("Y")
    val addr = store.mailAddresses.filter(col("stf_id") === staffId).collect().headOption
      .getOrElse(throw new IllegalStateException(s"no mail_addr_lookup row for staff id <$staffId>"))
    val sender = s"${initcap(addr.forename)}.${initcap(addr.name)}@$domain"
    val to = if (overrideTest) testRecipient else recipient
    val recipients = to.split(" ").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    notifier.send(sender, recipients, subject, body)
    if (auditOn)
      store.appendMailAudit(MailAudit(Timestamp.from(clock.now()), sender, to,
        copied = Some(""), blind_copied = Some(""), subject = subject))
    true
  }
}
