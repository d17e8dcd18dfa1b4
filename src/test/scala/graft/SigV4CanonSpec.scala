package graft.state

import org.scalatest.funsuite.AnyFunSuite

/** SigV4 canonicalization discipline (r18 advice): the validator's
  * canonical-request construction is an INDEPENDENT implementation, and
  * both sides percent-decode strictly — '+' in a query is a literal
  * plus (canonicalizes to %2B), never form-decoding's space. These pin
  * the exact divergence class the shared-path bug would have hidden:
  * with URLDecoder on both sides, "tag=a+b" canonicalized to
  * "tag=a%20b" twice, the signatures matched each other, and only a
  * real bucket's 403 would have caught it. */
class SigV4CanonSpec extends AnyFunSuite {

  private val creds = SigV4.Credentials("AKID", "sekret")
  private val at = java.time.Instant.parse("2026-08-15T12:00:00Z")

  test("'+' in a raw query is a literal plus: canonicalizes to %2B, not %20") {
    assert(SigV4.srvCanonicalQuery("tag=a+b") === "tag=a%2Bb",
      "form decoding ('+'→space) diverges from AWS query canonicalization")
    assert(SigV4.srvCanonicalQuery("tag=a%20b") === "tag=a%20b")
  }

  test("server canonical query: bare key, sort by name then value, unicode re-encode") {
    assert(SigV4.srvCanonicalQuery("b=2&a=1&marker") === "a=1&b=2&marker=")
    assert(SigV4.srvCanonicalQuery("k=%C3%A9") === "k=%C3%A9", "UTF-8 bytes re-encode stably")
    assert(SigV4.srvCanonicalQuery("a=2&a=1") === "a=1&a=2", "same name sorts by value")
  }

  test("strict client percent-decode: %2B round-trips, '+' unchanged, garbage throws") {
    assert(SigV4.pctDecode("a%2Bb") === "a+b")
    assert(SigV4.pctDecode("a+b") === "a+b")
    assert(SigV4.pctDecode("caf%C3%A9") === "café")
    intercept[IllegalArgumentException] { SigV4.pctDecode("bad%G1") }
    intercept[IllegalArgumentException] { SigV4.pctDecode("trunc%2") }
  }

  test("round trip across the two INDEPENDENT paths: sign → validate, tricky query included") {
    // a query mixing literal '+', an encoded plus, unicode, a bare key,
    // and out-of-order names — the client signs from the OUTGOING URI,
    // the validator rebuilds from the RAW exchange with its own
    // encode/sort/collapse; any divergence between the implementations
    // fails right here instead of against a real bucket
    // %FF is well-formed RFC 3986 but NOT valid UTF-8: a client path
    // that round-trips decoded bytes through a String mangles it to
    // U+FFFD and signs a different request than the byte-exact server
    // rebuilds (the r19 review's divergence finding)
    val uri = java.net.URI.create(
      "http://localhost:1/bucket/k%2Bey?z=last&tag=a+b&enc=%2B&u=caf%C3%A9&raw=%FF&bare")
    val payload = "hello".getBytes("UTF-8")
    val signer = new SigV4.Signer(creds, clock = () => at)
    val hdrs = signer.headers("GET", uri, Seq("If-Match" -> "\"abc\""), payload) ++
      Seq("host" -> uri.getAuthority, "If-Match" -> "\"abc\"")
    val hmap = hdrs.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }.toMap
    val hget = (n: String) => hmap.get(n.toLowerCase(java.util.Locale.ROOT))
    val verdict = SigV4.validate("GET", uri.getRawPath, uri.getRawQuery,
      hget, payload, ak => Some(creds).filter(_.accessKey == ak), now = () => at)
    assert(verdict === None, s"independent canonicalizations must agree: $verdict")
    // and a tampered query (the literal '+' swapped for a space-encode,
    // exactly the old shared-bug canonical form) must now FAIL
    val tampered = SigV4.validate("GET", uri.getRawPath, "z=last&tag=a%20b&enc=%2B&u=caf%C3%A9&raw=%FF&bare",
      hget, payload, ak => Some(creds).filter(_.accessKey == ak), now = () => at)
    assert(tampered.contains("signature mismatch"), s"got $tampered")
  }

  test("literal non-BMP character in the raw query: client and server canonicalizations agree") {
    // a literal 😀 is a surrogate PAIR in Java chars; encoding each lone
    // surrogate separately yields '?' bytes while the server encodes the
    // whole string correctly — the run-wise encode keeps them identical
    val s = "a😀b"
    assert(SigV4.pctDecodeBytes(s).toSeq === s.getBytes("UTF-8").toSeq,
      "client decode of an unescaped run must be byte-exact UTF-8")
    // full round trip with the literal char in the query (java.net.URI
    // permits non-US-ASCII 'other' characters in a raw query)
    val uri = java.net.URI.create("http://localhost:1/bucket/key?e=" + s)
    val payload = Array.emptyByteArray
    val signer = new SigV4.Signer(creds, clock = () => at)
    val hdrs = signer.headers("GET", uri, Nil, payload) ++ Seq("host" -> uri.getAuthority)
    val hmap = hdrs.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }.toMap
    val hget = (n: String) => hmap.get(n.toLowerCase(java.util.Locale.ROOT))
    val verdict = SigV4.validate("GET", uri.getRawPath, uri.getRawQuery,
      hget, payload, ak => Some(creds).filter(_.accessKey == ak), now = () => at)
    assert(verdict === None, s"surrogate-pair query must verify: $verdict")
  }

  test("malformed percent escapes in the incoming query are a 403-class rejection, not a server error") {
    val uri = java.net.URI.create("http://localhost:1/bucket/key?ok=1")
    val payload = Array.emptyByteArray
    val signer = new SigV4.Signer(creds, clock = () => at)
    val hdrs = signer.headers("GET", uri, Nil, payload) ++ Seq("host" -> uri.getAuthority)
    val hmap = hdrs.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }.toMap
    val hget = (n: String) => hmap.get(n.toLowerCase(java.util.Locale.ROOT))
    val verdict = SigV4.validate("GET", uri.getRawPath, "ok=%ZZ",
      hget, payload, _ => Some(creds), now = () => at)
    assert(verdict.exists(_.startsWith("malformed request")), s"got $verdict")
  }
}
