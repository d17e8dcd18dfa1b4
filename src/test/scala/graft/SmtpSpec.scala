package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lifecycle.Smtp

/** The SMTP client's PROTOCOL discipline, fault by fault — the
  * [[TxnLogBehaviors]] treatment for the mail plane: transient faults
  * retry bounded, permanent faults never retry, dropped connections
  * re-run the whole transaction, and the durable side (the server's
  * accepted queue) shows exactly the at-least-once contract. */
class SmtpSpec extends AnyFunSuite {

  test("happy path: one connection, one delivery, QUIT honored") {
    val server = new Smtp.Server()
    try {
      val c = new Smtp.Client(server.host, server.port)
      val attempts = c.send("ops@example.com", Seq("dev@example.com"), "s", "b")
      assert(attempts === 1)
      assert(server.delivered.map(_.sender) === Seq("ops@example.com"))
      assert(server.mailCommands === 1)
    } finally server.stop()
  }

  test("transient 451s: the TRANSACTION retries bounded, exactly one delivery lands") {
    // the reference's UTL_SMTP path would raise to the caller on the
    // first 4yz; a deployment-grade client drains the relay's greylist
    val server = new Smtp.Server(failFirstMails = 2)
    try {
      val c = new Smtp.Client(server.host, server.port, maxRetries = 3)
      val attempts = c.send("ops@example.com", Seq("dev@example.com"), "s", "b")
      assert(attempts === 3, "two 451s then the win")
      assert(server.delivered.size === 1, "at-least-once resolved to exactly once here")
      assert(server.mailCommands === 3, "each retry is a fresh MAIL transaction")
    } finally server.stop()
  }

  test("transient faults past the budget fail loudly, naming the relay") {
    val server = new Smtp.Server(failFirstMails = 99)
    try {
      val c = new Smtp.Client(server.host, server.port, maxRetries = 2)
      val e = intercept[java.io.IOException] {
        c.send("ops@example.com", Seq("dev@example.com"), "s", "b")
      }
      assert(e.getMessage.contains("after 3 attempts"), e.getMessage)
      assert(server.delivered.isEmpty)
    } finally server.stop()
  }

  test("dropped connection: a fresh conversation, not a resumed one") {
    val server = new Smtp.Server(dropFirstConnections = 1)
    try {
      val c = new Smtp.Client(server.host, server.port, maxRetries = 2)
      val attempts = c.send("ops@example.com", Seq("dev@example.com"), "s", "b")
      assert(attempts === 2)
      assert(server.delivered.size === 1)
    } finally server.stop()
  }

  test("permanent 550 never retries — one MAIL command total") {
    val server = new Smtp.Server(rejectRecipient = Some("gone@example.com"))
    try {
      val c = new Smtp.Client(server.host, server.port, maxRetries = 5)
      intercept[Smtp.PermanentFailure] {
        c.send("ops@example.com", Seq("gone@example.com"), "s", "b")
      }
      assert(server.mailCommands === 1,
        "5yz is the do-not-retry class; hammering the relay is a bug")
      assert(server.delivered.isEmpty)
    } finally server.stop()
  }

  test("multi-recipient transaction: every RCPT in one conversation") {
    val server = new Smtp.Server()
    try {
      val c = new Smtp.Client(server.host, server.port)
      c.send("ops@example.com", Seq("a@x.com", "b@x.com", "c@x.com"), "s", "b")
      assert(server.delivered.head.recipients === Seq("a@x.com", "b@x.com", "c@x.com"))
    } finally server.stop()
  }

  test("pre-ESMTP relay: EHLO 502 falls back to HELO (the reference's own verb) in the same conversation") {
    val server = new Smtp.Server(rejectEhlo = true)
    try {
      val c = new Smtp.Client(server.host, server.port, maxRetries = 0)
      assert(c.send("ops@example.com", Seq("dev@example.com"), "s", "b") === 1,
        "the fallback is within the conversation, not a transaction retry")
      assert(server.delivered.size === 1)
    } finally server.stop()
  }

  test("RCPT 251 (user not local; will forward) is an accepted recipient, not a failure") {
    val server = new Smtp.Server(forwardRecipient = Some("moved@example.com"))
    try {
      val c = new Smtp.Client(server.host, server.port)
      c.send("ops@example.com", Seq("dev@example.com", "moved@example.com"), "s", "b")
      assert(server.delivered.head.recipients === Seq("dev@example.com", "moved@example.com"))
    } finally server.stop()
  }

  test("a 554 greeting is the relay refusing service — permanent, one connection total") {
    val server = new Smtp.Server(refuseService = true)
    try {
      val c = new Smtp.Client(server.host, server.port, maxRetries = 5)
      intercept[Smtp.PermanentFailure] {
        c.send("ops@example.com", Seq("dev@example.com"), "s", "b")
      }
      assert(server.mailCommands === 0, "refused at greeting; no MAIL may follow")
    } finally server.stop()
  }

  test("lost 250 after DATA: the duplicate delivery carries the SAME Message-ID (the dedup key)") {
    // the at-least-once case itself: the relay queues the mail, the ack
    // is lost, the client retries the whole transaction — two copies
    // land, and the stable Message-ID is what lets a receiver collapse
    // them (a per-attempt id would make the promise in the scaladoc a lie)
    val server = new Smtp.Server(dropAfterData = 1)
    try {
      val c = new Smtp.Client(server.host, server.port, maxRetries = 2)
      val attempts = c.send("ops@example.com", Seq("dev@example.com"), "s", "b")
      assert(attempts === 2)
      assert(server.delivered.size === 2, "queued twice — at-least-once, literally")
      val ids = server.delivered.map(_.data.linesIterator
        .find(_.startsWith("Message-ID:")).get)
      assert(ids.distinct.size === 1, s"both copies must share the dedup key, got $ids")
      // and the To header is a valid RFC 5322 address-list
      assert(server.delivered.head.data.contains("To: dev@example.com\r\n"))
    } finally server.stop()
  }

  test("Bcc rides the envelope only: RCPT'd and delivered, never a header; empty Cc emits no header") {
    // the reference stuffs 'Bcc:' into DATA (body:1119-1121), which
    // DISCLOSES blind recipients to everyone — here the envelope gets
    // them and the header never exists (RFC 5322 §3.6.3)
    val server = new Smtp.Server()
    try {
      val c = new Smtp.Client(server.host, server.port)
      c.send("ops@example.com", Seq("dev@example.com"), "s", "b",
        cc = "watch@example.com", bcc = "secret@example.com")
      val Seq(d) = server.delivered
      assert(d.recipients === Seq("dev@example.com", "watch@example.com", "secret@example.com"),
        "To, Cc AND Bcc must all be RCPT'd — a headers-only 'send' delivers to no one")
      assert(d.data.contains("Cc: watch@example.com\r\n"))
      assert(!d.data.contains("secret@example.com"),
        "the blind recipient must not appear anywhere in the delivered bytes")
      assert(!d.data.contains("Bcc"), "no Bcc header, ever")
      // and with the defaults, no empty-address-list headers at all
      c.send("ops@example.com", Seq("dev@example.com"), "s2", "b2")
      val d2 = server.delivered.last
      assert(!d2.data.contains("Cc:") && !d2.data.contains("Bcc:"),
        "empty Cc/Bcc must omit the headers — an empty address-list is itself invalid")
    } finally server.stop()
  }

  test("multi-recipient To header is comma-separated (RFC 5322 address-list)") {
    val server = new Smtp.Server()
    try {
      new Smtp.Client(server.host, server.port)
        .send("ops@example.com", Seq("a@x.com", "b@x.com"), "s", "b")
      assert(server.delivered.head.data.contains("To: a@x.com, b@x.com\r\n"))
    } finally server.stop()
  }

  test("EHLO 554 (policy rejection) stays PERMANENT — no HELO fallback, no retry") {
    // the r18 blanket fallback retried HELO on ANY 5yz; this server
    // would 250 a HELO, so a wrong fallback becomes a visible delivery
    val server = new Smtp.Server(rejectEhloPolicy = true)
    try {
      val c = new Smtp.Client(server.host, server.port, maxRetries = 3)
      val e = intercept[Smtp.PermanentFailure] {
        c.send("ops@example.com", Seq("dev@example.com"), "s", "b")
      }
      assert(e.code === 554, e.getMessage)
      assert(server.delivered.isEmpty, "a HELO fallback would have delivered — session refusal must stand")
      assert(server.mailCommands === 0)
    } finally server.stop()
  }

  test("relay hangs up right after the final 250: accepted once, never re-run from the goodbye phase") {
    val server = new Smtp.Server(closeAfterAck = true)
    try {
      val c = new Smtp.Client(server.host, server.port, maxRetries = 3)
      val attempts = c.send("ops@example.com", Seq("dev@example.com"), "s", "b")
      assert(attempts === 1, "the QUIT write/flush/221 are all inside the swallow guard — no retry")
      assert(server.delivered.size === 1, "a goodbye-phase broken pipe must not duplicate an accepted mail")
    } finally server.stop()
  }

  test("CRLF in an address is refused before any connection — header/command injection") {
    val server = new Smtp.Server()
    try {
      val c = new Smtp.Client(server.host, server.port)
      intercept[IllegalArgumentException] {
        c.send("ops@example.com", Seq("dev@example.com\r\nRCPT TO:<evil@x.com>"), "s", "b")
      }
      intercept[IllegalArgumentException] {
        c.send("ops@example.com>\r\nMAIL FROM:<evil@x.com", Seq("dev@example.com"), "s", "b")
      }
      intercept[IllegalArgumentException] {
        c.send("ops@example.com", Seq("dev@example.com"), "s", "b", bcc = "a@x.com\r\nDATA")
      }
      assert(server.mailCommands === 0 && server.delivered.isEmpty,
        "injection attempts must die before the socket opens")
    } finally server.stop()
  }

  test("CRLF in the subject folds to one line — failure text cannot inject headers") {
    // the subject carries free-form module-failure text; folding keeps
    // the notification flowing while the injected 'header' stays inert
    val server = new Smtp.Server()
    try {
      new Smtp.Client(server.host, server.port)
        .send("ops@example.com", Seq("dev@example.com"),
          "job failed:\r\nX-Evil: injected\r\n boom", "b")
      val data = server.delivered.head.data
      assert(data.contains("Subject: job failed: X-Evil: injected boom\r\n"),
        s"subject must fold, got: ${data.linesIterator.find(_.startsWith("Subject")).getOrElse("?")}")
      assert(!data.linesIterator.exists(_.startsWith("X-Evil")),
        "no injected header line may materialize")
    } finally server.stop()
  }

  test("CRLF body round-trip: multiline bodies and leading-dot lines survive") {
    val server = new Smtp.Server()
    try {
      val c = new Smtp.Client(server.host, server.port)
      c.send("ops@example.com", Seq("dev@example.com"), "s",
        "line1\n..double dot\n.single\n\nlast")
      val data = server.delivered.head.data
      assert(data.contains("\r\n..double dot\r\n"))
      assert(data.contains("\r\n.single\r\n"))
      assert(data.endsWith("\r\n\r\nlast\r\n"), data.takeRight(30))
    } finally server.stop()
  }
}
