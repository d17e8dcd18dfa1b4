package graft.state

import java.net.URI

/** AWS Signature Version 4 — the auth layer the object-store binding's
  * scaladoc listed as "the one piece a production S3 binding still
  * adds" (r17 verdict item 3; HttpBucket.scala documented it as prose,
  * this makes it code). Public algorithm, implemented from the spec:
  * canonical request → string-to-sign → HMAC signing-key chain
  * (kSecret → kDate → kRegion → kService → "aws4_request") →
  * `Authorization: AWS4-HMAC-SHA256 ...`.
  *
  * Two INDEPENDENT canonicalization paths on purpose: the client-side
  * [[Signer]] builds its canonical request from the OUTGOING request
  * parts (method, URI, the headers it is about to attach), while the
  * server-side [[validate]] rebuilds it from the RAW incoming exchange
  * (path/query/headers/body as received) — and, since round 19, the
  * validator's encode/decode/sort/collapse logic is a SEPARATE
  * implementation (the `srv*` functions below, byte-stream mechanics
  * vs the client's StringBuilder mechanics), so a shared
  * canonicalization bug cannot cancel out across the round trip. Only
  * the low-level crypto (SHA-256, HMAC) is shared. Both sides
  * percent-decode strictly (RFC 3986): '+' in a query is a literal
  * plus that canonicalizes to %2B — NOT form-decoding's space, which
  * is the divergence-from-real-S3 class the independent paths exist
  * to catch.
  *
  * What the signature COVERS here matters for the commit plane: the
  * conditional headers (`If-None-Match`, `If-Match`) are part of
  * SignedHeaders, so a middlebox cannot strip the one-winner
  * precondition off a commit PUT or the guarded DELETE without
  * invalidating the signature — the protocol's safety rides on those
  * headers, and signing them is what makes the auth layer protect the
  * protocol rather than just the payload.
  */
object SigV4 {

  final case class Credentials(accessKey: String, secretKey: String,
      region: String = "us-east-1", service: String = "s3")

  private val hexDigits = "0123456789abcdef"
  private[state] def hex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach { x => sb += hexDigits((x >> 4) & 0xf); sb += hexDigits(x & 0xf) }
    sb.toString
  }
  private[state] def sha256Hex(b: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(b))
  private[state] def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data.getBytes("UTF-8"))
  }

  /** kSecret → kDate → kRegion → kService → kSigning, per the spec. */
  private def signingKey(secret: String, date: String, region: String,
      service: String): Array[Byte] =
    hmac(hmac(hmac(hmac(("AWS4" + secret).getBytes("UTF-8"), date),
      region), service), "aws4_request")

  /** AWS URI-encode (unreserved = A-Za-z0-9 - . _ ~; space = %20).
    * Defined THROUGH [[awsEncodeBytes]] so the client has exactly one
    * byte-level encoder — a future tweak to the unreserved set cannot
    * desynchronize path-encoding from query-encoding (r19 review). */
  private def awsEncode(s: String): String = awsEncodeBytes(s.getBytes("UTF-8"))

  /** Strict RFC 3986 percent-decode to RAW BYTES (client side). Unlike
    * `URLDecoder.decode` (form decoding), '+' stays a literal plus —
    * AWS query canonicalization percent-encodes it as %2B, it is never
    * a space. Bytes, not a String: round-tripping escaped bytes through
    * a UTF-8 String turns well-formed non-UTF-8 escapes (a legal `%FF`)
    * into U+FFFD, and a canonicalization that mangles what it re-encodes
    * would sign a different request than the server validates (the r19
    * review's divergence finding). Malformed escapes throw
    * IllegalArgumentException, which the validator maps to the
    * non-retried 403 class. */
  private[state] def pctDecodeBytes(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length)
          throw new IllegalArgumentException(s"truncated percent escape at offset $i")
        val hi = Character.digit(s.charAt(i + 1), 16)
        val lo = Character.digit(s.charAt(i + 2), 16)
        if (hi < 0 || lo < 0)
          throw new IllegalArgumentException(s"bad percent escape '${s.substring(i, i + 3)}'")
        out.write(hi * 16 + lo); i += 3
      } else {
        // UTF-8-encode the whole contiguous unescaped run, not one Java
        // char at a time: a literal non-BMP character (legal in a raw
        // java.net.URI query) is a surrogate PAIR, and encoding each
        // lone surrogate separately turns both into '?' while the
        // server-side srvDecodeBytes encodes the full string correctly
        // — a client/server canonicalization divergence and a spurious
        // signature mismatch (same class as the r19 %FF finding).
        var j = i
        while (j < s.length && s.charAt(j) != '%') j += 1
        out.write(s.substring(i, j).getBytes("UTF-8")); i = j
      }
    }
    out.toByteArray
  }

  /** [[pctDecodeBytes]] as text, for callers (and specs) that assert on
    * decoded VALID UTF-8; canonicalization itself never takes this
    * lossy path. */
  private[state] def pctDecode(s: String): String =
    new String(pctDecodeBytes(s), "UTF-8")

  /** AWS URI-encode straight from raw bytes — the byte-exact twin of
    * [[awsEncode]] used where the input came off the wire already
    * percent-encoded. */
  private def awsEncodeBytes(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    bytes.foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c)) sb += c
      else sb ++= f"%%${b & 0xff}%02X"
    }
    sb.toString
  }

  /** Canonical query string: each pair strictly percent-decoded to raw
    * bytes then AWS-encoded byte-for-byte (never through a String —
    * see [[pctDecodeBytes]]), `k` alone becomes `k=`, sorted by name
    * then value. */
  private def canonicalQuery(rawQuery: String): String =
    if (rawQuery == null || rawQuery.isEmpty) ""
    else rawQuery.split('&').filter(_.nonEmpty).map { tok =>
      val i = tok.indexOf('=')
      val (k, v) = if (i < 0) (tok, "") else (tok.take(i), tok.drop(i + 1))
      (awsEncodeBytes(pctDecodeBytes(k)), awsEncodeBytes(pctDecodeBytes(v)))
    }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  private def canonicalRequest(method: String, rawPath: String, rawQuery: String,
      headers: Seq[(String, String)], payloadHash: String): (String, String) = {
    val canon = headers.map { case (k, v) =>
      (k.toLowerCase(java.util.Locale.ROOT), v.trim.replaceAll("[ \t]+", " "))
    }.sortBy(_._1)
    val signedHeaders = canon.map(_._1).mkString(";")
    val cr = Seq(method, rawPath, canonicalQuery(rawQuery),
      canon.map { case (k, v) => s"$k:$v\n" }.mkString,
      signedHeaders, payloadHash).mkString("\n")
    (cr, signedHeaders)
  }

  private val amzFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd'T'HHmmss'Z'", java.util.Locale.ROOT)
    .withZone(java.time.ZoneOffset.UTC)

  /** Client middleware: computes the three headers a signed request
    * carries. `extraSigned` = the request's own semantic headers that
    * must ride under the signature (`If-None-Match`, `If-Match`). */
  final class Signer(creds: Credentials,
      clock: () => java.time.Instant = () => java.time.Instant.now()) {
    def headers(method: String, uri: URI, extraSigned: Seq[(String, String)],
        payload: Array[Byte]): Seq[(String, String)] = {
      val amzDate = amzFmt.format(clock())
      val date = amzDate.take(8)
      val payloadHash = sha256Hex(payload)
      val hostHeader = uri.getAuthority // java.net.http sets Host itself; sign what it will send
      val toSign = extraSigned ++ Seq(
        "host" -> hostHeader,
        "x-amz-content-sha256" -> payloadHash,
        "x-amz-date" -> amzDate)
      val (cr, signedHeaders) = canonicalRequest(method,
        Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/"),
        uri.getRawQuery, toSign, payloadHash)
      val scope = s"$date/${creds.region}/${creds.service}/aws4_request"
      val sts = Seq("AWS4-HMAC-SHA256", amzDate, scope, sha256Hex(cr.getBytes("UTF-8"))).mkString("\n")
      val sig = hex(hmac(signingKey(creds.secretKey, date, creds.region, creds.service), sts))
      Seq(
        "x-amz-date" -> amzDate,
        "x-amz-content-sha256" -> payloadHash,
        "Authorization" -> (s"AWS4-HMAC-SHA256 Credential=${creds.accessKey}/$scope, " +
          s"SignedHeaders=$signedHeaders, Signature=$sig"))
    }
  }

  // ------------------------------------------------------------------
  // Server-side canonicalization — an INDEPENDENT implementation.
  // Deliberately does not call awsEncode/pctDecode/canonicalQuery/
  // canonicalRequest above: the validator exists to catch the client's
  // canonicalization bugs, which it can only do if a defect cannot be
  // shared. Mechanics differ on purpose (byte-array walks and manual
  // buffers here vs the client's Char/StringBuilder style); any
  // behavioral divergence between the two paths fails the round trip
  // loudly in the specs instead of surfacing as a 403 against a real
  // bucket.
  // ------------------------------------------------------------------

  /** Server-side RFC 3986 percent-decode to raw BYTES ('+' literal). */
  private def srvDecodeBytes(s: String): Array[Byte] = {
    val in = s.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    while (i < in.length) {
      if (in(i) == '%') {
        if (i + 2 >= in.length)
          throw new IllegalArgumentException("truncated percent escape in query")
        val hi = Character.digit(in(i + 1).toChar, 16)
        val lo = Character.digit(in(i + 2).toChar, 16)
        if (hi < 0 || lo < 0)
          throw new IllegalArgumentException("invalid percent escape in query")
        out.write((hi << 4) | lo); i += 3
      } else { out.write(in(i)); i += 1 }
    }
    out.toByteArray
  }

  /** Server-side AWS uri-encode over raw bytes (unreserved =
    * A-Za-z0-9 - . _ ~; everything else %XX uppercase). */
  private def srvEncode(bytes: Array[Byte]): String = {
    val out = new java.lang.StringBuilder(bytes.length * 3)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val unreserved =
        (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
        (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'
      if (unreserved) out.append(b.toChar)
      else { out.append('%'); out.append("0123456789ABCDEF".charAt(b >>> 4)); out.append("0123456789ABCDEF".charAt(b & 0xf)) }
      i += 1
    }
    out.toString
  }

  /** Server-side canonical query: decode-then-encode each pair, bare
    * `k` → `k=`, byte-order sort on (name, value). Exposed
    * private[state] so the spec can pin '+'→%2B directly. */
  private[state] def srvCanonicalQuery(rawQuery: String): String = {
    if (rawQuery == null || rawQuery.isEmpty) return ""
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    rawQuery.split("&", -1).foreach { tok =>
      if (tok.nonEmpty) {
        val eq = tok.indexOf('=')
        val rawK = if (eq < 0) tok else tok.substring(0, eq)
        val rawV = if (eq < 0) "" else tok.substring(eq + 1)
        pairs += ((srvEncode(srvDecodeBytes(rawK)), srvEncode(srvDecodeBytes(rawV))))
      }
    }
    pairs.sorted.iterator.map { case (k, v) => k + "=" + v }.mkString("&")
  }

  /** Server-side canonical request: lowercase names, trim + collapse
    * internal whitespace runs in values, sort by name, one `k:v\n`
    * line each. Returns (canonicalRequest, signedHeadersRebuilt). */
  private def srvCanonicalRequest(method: String, rawPath: String,
      rawQuery: String, headers: Seq[(String, String)],
      payloadHash: String): (String, String) = {
    val norm = headers.map { case (name, value) =>
      val n = name.toLowerCase(java.util.Locale.ROOT)
      // collapse runs of SP/HTAB to one space, trim ends — manual walk
      val v = value.trim
      val vb = new java.lang.StringBuilder(v.length)
      var j = 0
      var inWs = false
      while (j < v.length) {
        val ch = v.charAt(j)
        if (ch == ' ' || ch == '\t') { if (!inWs) vb.append(' '); inWs = true }
        else { vb.append(ch); inWs = false }
        j += 1
      }
      (n, vb.toString)
    }.sortBy(_._1)
    val signed = norm.iterator.map(_._1).mkString(";")
    val lines = new java.lang.StringBuilder
    lines.append(method).append('\n')
    lines.append(rawPath).append('\n')
    lines.append(srvCanonicalQuery(rawQuery)).append('\n')
    norm.foreach { case (k, v) => lines.append(k).append(':').append(v).append('\n') }
    lines.append('\n')
    lines.append(signed).append('\n')
    lines.append(payloadHash)
    (lines.toString, signed)
  }

  /** Server-side validation from the RAW incoming request. Returns
    * None when the signature verifies; Some(reason) otherwise. The
    * bucket emulation answers 403 on Some — the loud, non-retried
    * failure class (4xx), exactly how a real bucket treats a bad
    * signature. Checks, in order: header presence, credential scope,
    * clock skew (±15 min, the AWS window), payload-hash integrity,
    * and the recomputed signature. */
  def validate(method: String, rawPath: String, rawQuery: String,
      header: String => Option[String], payload: Array[Byte],
      secretFor: String => Option[Credentials],
      now: () => java.time.Instant = () => java.time.Instant.now()): Option[String] =
    // a malformed request (unparseable x-amz-date, bad percent-escapes
    // in the query, a short Credential) is a REJECTION, not a server
    // error: letting the exception escape would turn it into a 5xx,
    // which clients treat as transient and retry — the non-retried 403
    // class is the contract (r18 review). NARROW catch, deliberately:
    // DateTimeException + IllegalArgumentException are exactly what the
    // parse/decode sites throw on client-supplied garbage; a validator-
    // internal defect (NPE, a failing secretFor callback) still
    // surfaces as the server error it is, not a client-attributed 403.
    try validateImpl(method, rawPath, rawQuery, header, payload, secretFor, now)
    catch {
      case e @ (_: java.time.DateTimeException | _: IllegalArgumentException) =>
        Some(s"malformed request: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def validateImpl(method: String, rawPath: String, rawQuery: String,
      header: String => Option[String], payload: Array[Byte],
      secretFor: String => Option[Credentials],
      now: () => java.time.Instant): Option[String] = {
    val auth = header("Authorization").getOrElse(return Some("missing Authorization"))
    if (!auth.startsWith("AWS4-HMAC-SHA256 ")) return Some("not SigV4")
    val parts = auth.drop("AWS4-HMAC-SHA256 ".length).split(",").map(_.trim)
      .flatMap { p => val i = p.indexOf('='); if (i < 0) None else Some(p.take(i) -> p.drop(i + 1)) }
      .toMap
    val cred = parts.getOrElse("Credential", return Some("missing Credential"))
    val signedHeaders = parts.getOrElse("SignedHeaders", return Some("missing SignedHeaders"))
    val sentSig = parts.getOrElse("Signature", return Some("missing Signature"))
    val credParts = cred.split("/")
    if (credParts.length != 5 || credParts(4) != "aws4_request") return Some(s"malformed scope: $cred")
    val Array(accessKey, date, region, service, _) = credParts
    val creds = secretFor(accessKey).getOrElse(return Some(s"unknown access key $accessKey"))
    if (region != creds.region || service != creds.service)
      return Some(s"scope $region/$service does not match ${creds.region}/${creds.service}")
    val amzDate = header("x-amz-date").getOrElse(return Some("missing x-amz-date"))
    if (!amzDate.startsWith(date)) return Some("x-amz-date does not match credential date")
    val reqAt = java.time.Instant.from(amzFmt.parse(amzDate))
    if (math.abs(java.time.Duration.between(reqAt, now()).getSeconds) > 900)
      return Some("request outside the 15-minute skew window")
    val contentSha = header("x-amz-content-sha256").getOrElse(return Some("missing x-amz-content-sha256"))
    if (contentSha != sha256Hex(payload))
      return Some("payload hash mismatch — body does not match x-amz-content-sha256")
    // signature covers If-None-Match/If-Match when sent: a signed
    // request whose preconditions were stripped or altered in flight
    // reconstructs a DIFFERENT canonical request here and fails
    val hdrs = signedHeaders.split(";").toSeq.map { name =>
      name -> header(name).getOrElse(return Some(s"signed header $name absent"))
    }
    val (cr, shRebuilt) = srvCanonicalRequest(method, rawPath, rawQuery, hdrs, contentSha)
    if (shRebuilt != signedHeaders) return Some("SignedHeaders not sorted canonically")
    val scope = s"$date/$region/$service/aws4_request"
    val sts = Seq("AWS4-HMAC-SHA256", amzDate, scope, sha256Hex(cr.getBytes("UTF-8"))).mkString("\n")
    val expect = hex(hmac(signingKey(creds.secretKey, date, region, service), sts))
    if (!java.security.MessageDigest.isEqual(expect.getBytes, sentSig.getBytes))
      Some("signature mismatch")
    else None
  }
}
