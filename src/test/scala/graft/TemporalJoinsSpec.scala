package graft

import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** asofJoin edge semantics on tiny in-memory frames (the 10k-row behavior
  * is hash-verified against DuckDB's native ASOF JOIN by the driver gate).
  */
class TemporalJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  test("scd2: consecutive duplicates collapse, intervals chain, last version is current") {
    val events = Seq(
      // user 1: A, A (restatement — no new version), B, B, A
      (1L, "A", ts("2026-01-01T10:00:00Z"), 1L),
      (1L, "A", ts("2026-01-01T11:00:00Z"), 2L),
      (1L, "B", ts("2026-01-01T12:00:00Z"), 3L),
      (1L, "B", ts("2026-01-01T13:00:00Z"), 4L),
      (1L, "A", ts("2026-01-01T14:00:00Z"), 5L),
      // user 2: a single event → one current version
      (2L, "X", ts("2026-01-01T09:00:00Z"), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = graft.operators.EventOps.scd2Of(events).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getTimestamp(2).toInstant.toString,
        Option(r.getTimestamp(3)).map(_.toInstant.toString),
        r.getLong(4), r.getInt(5)))
    assert(got.toSeq === Seq(
      (1L, "A", "2026-01-01T10:00:00Z", Some("2026-01-01T12:00:00Z"), 1L, 0),
      (1L, "B", "2026-01-01T12:00:00Z", Some("2026-01-01T14:00:00Z"), 2L, 0),
      (1L, "A", "2026-01-01T14:00:00Z", None, 3L, 1),
      (2L, "X", "2026-01-01T09:00:00Z", None, 1L, 1)))
    // intervals tile each user's history: every valid_to is the next
    // version's valid_from, exactly one open interval per user
    assert(got.filter(_._6 == 1).map(_._1).toSeq.sorted === Seq(1L, 2L))
  }

  test("scd2: same-timestamp changes order by event_id, zero-length interval included") {
    val events = Seq(
      (1L, "A", ts("2026-01-01T10:00:00Z"), 1L),
      (1L, "B", ts("2026-01-01T10:00:00Z"), 2L) // same instant: B wins by event_id
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = graft.operators.EventOps.scd2Of(events).collect().map(r =>
      (r.getString(1), r.getLong(4), r.getInt(5)))
    assert(got.toSeq === Seq(("A", 1L, 0), ("B", 2L, 1)),
      "tie-broken ordering must be deterministic and keep both versions")
  }

  test("funnel: steps count only in order — a click before the view earns no credit") {
    val events = Seq(
      // user 1 converts fully, in order
      (1L, "view", ts("2026-01-01T10:00:00Z")),
      (1L, "click", ts("2026-01-01T11:00:00Z")),
      (1L, "purchase", ts("2026-01-01T12:00:00Z")),
      // user 2 clicked BEFORE viewing: no step-2 credit, so the
      // later purchase cannot count either
      (2L, "click", ts("2026-01-01T10:00:00Z")),
      (2L, "view", ts("2026-01-01T11:00:00Z")),
      (2L, "purchase", ts("2026-01-01T12:00:00Z")),
      // user 3 only views
      (3L, "view", ts("2026-01-01T10:00:00Z"))
    ).toDF("user_id", "event_type", "ts")
    val got = graft.operators.EventOps.funnelOf(spark, events).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1, "view", 3L, 1.0),
      (2, "click", 1L, 0.333333),
      (3, "purchase", 1L, 0.333333)))
  }

  test("cohort: users group by first-seen day; retention divides by the day-0 cohort size") {
    val events = Seq(
      (1L, ts("2026-01-01T09:00:00Z")), (1L, ts("2026-01-02T09:00:00Z")),
      (2L, ts("2026-01-01T15:00:00Z")),
      (3L, ts("2026-01-02T09:00:00Z")), (3L, ts("2026-01-03T09:00:00Z"))
    ).toDF("user_id", "ts")
    val got = graft.operators.EventOps.cohortOf(events).collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("2026-01-01T00:00:00Z", 0L, 2L, 1.0),
      ("2026-01-01T00:00:00Z", 1L, 1L, 0.5),
      ("2026-01-02T00:00:00Z", 0L, 1L, 1.0),
      ("2026-01-02T00:00:00Z", 1L, 1L, 1.0)))
  }

  test("gap fill: hourly grid tiles the span, gaps carry the last observed value forward") {
    val events = Seq(
      // user 1: hours 10, 11, 14 observed → gaps at 12, 13 fill with 11's sum
      (1L, ts("2026-01-01T10:15:00Z"), 1.5),
      (1L, ts("2026-01-01T11:05:00Z"), 2.0),
      (1L, ts("2026-01-01T11:45:00Z"), 0.5), // same hour as above: sums to 2.5
      (1L, ts("2026-01-01T14:30:00Z"), 4.0),
      // user 2: a single hour → one grid row, no gaps
      (2L, ts("2026-01-01T09:00:00Z"), 7.0)
    ).toDF("user_id", "ts", "value")
    val got = graft.operators.EventOps.gapFillHourly(events).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getInt(3), r.getDouble(4)))
    val want = Seq(
      (1L, "2026-01-01T10:00:00Z", Some(1.5), 0, 1.5),
      (1L, "2026-01-01T11:00:00Z", Some(2.5), 0, 2.5),
      (1L, "2026-01-01T12:00:00Z", None, 1, 2.5),
      (1L, "2026-01-01T13:00:00Z", None, 1, 2.5),
      (1L, "2026-01-01T14:00:00Z", Some(4.0), 0, 4.0),
      (2L, "2026-01-01T09:00:00Z", Some(7.0), 0, 7.0))
    assert(got.toSeq === want)
  }

  test("as-of join: backward inclusive, per-key, null when nothing precedes") {
    val left = Seq(
      (1L, ts("2026-01-01T10:00:00Z")), // before any right row → null
      (1L, ts("2026-01-01T12:00:00Z")), // exactly at a right row → inclusive
      (1L, ts("2026-01-01T15:00:00Z")), // between rows → latest earlier
      (2L, ts("2026-01-01T12:30:00Z")), // other key → that key's rows only
      (3L, ts("2026-01-01T12:30:00Z"))  // key with no right rows at all
    ).toDF("k", "t")
    val right = Seq(
      (1L, ts("2026-01-01T12:00:00Z"), "a"),
      (1L, ts("2026-01-01T14:00:00Z"), "b"),
      (2L, ts("2026-01-01T12:15:00Z"), "x")
    ).toDF("k", "rt", "v")

    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("k", "t")
      .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSeq
    assert(out === Seq(
      (1L, None), (1L, Some("a")), (1L, Some("b")),
      (2L, Some("x")), (3L, None)))
  }

  test("rolling 1h range frame: inclusive boundary at exactly 3600s, micros precision") {
    val events = Seq(
      // user 1: a cluster, then probes at the frame boundary
      (1L, 10L, ts("2026-01-01T10:00:00Z"), 1.0),
      (1L, 11L, ts("2026-01-01T10:30:00Z"), 2.0),
      (1L, 12L, ts("2026-01-01T11:00:00Z"), 4.0),    // exactly 3600s after e10: IN
      (1L, 13L, ts("2026-01-01T11:00:00.000001Z"), 8.0), // 1µs past: e10 OUT
      (1L, 14L, ts("2026-01-01T13:00:00Z"), 16.0),   // isolated
      // user 2: same timestamps must not leak across users
      (2L, 20L, ts("2026-01-01T10:59:00Z"), 100.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = graft.operators.EventOps.rolling1hOf(events).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getDouble(4)))
    val want = Seq(
      (10L, 1L, 1.0),
      (11L, 2L, 3.0),
      (12L, 3L, 7.0),   // 10:00:00 still inside the inclusive trailing hour
      (13L, 3L, 14.0),  // e10 dropped, e13 joined
      (14L, 1L, 16.0),
      (20L, 1L, 100.0))
    assert(got.toSeq === want)
  }

  test("as-of join property: equals the brute-force reference on random inputs") {
    val rnd = new scala.util.Random(42) // fixed seed — deterministic test
    val base = Instant.parse("2026-01-01T00:00:00Z")
    val leftRows = (1 to 200).map { i =>
      (rnd.nextInt(5).toLong, Timestamp.from(base.plusSeconds(rnd.nextInt(10000).toLong)), i.toLong)
    }
    val rightRows = (1 to 80).map { i =>
      (rnd.nextInt(5).toLong, Timestamp.from(base.plusSeconds(rnd.nextInt(10000).toLong)), i.toLong * 100)
    }
    val left = leftRows.toDF("k", "t", "lid")
    val right = rightRows.toDF("k", "rt", "v")
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => r.getLong(2) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // brute force: latest right row with rt <= t on the key; ties on rt
    // resolve to the greatest value tuple (the documented determinism rule)
    val expected = leftRows.map { case (k, t, lid) =>
      val cands = rightRows.filter(r => r._1 == k && !r._2.after(t))
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    assert(got === expected)
  }

  test("as-of join ScalaCheck property: ties, nulls and empties match brute force") {
    // Generator is tuned for the failure classes this operator has
    // actually produced (NULL-carry, tie stitching): a 20-second time
    // domain over 3 keys forces many exact timestamp ties, values are
    // Options so matched rows carry NULLs, and shrinking covers the
    // empty-side cases. Two value columns catch cross-row stitching.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val base = Instant.parse("2026-01-01T00:00:00Z")
    def mkTs(sec: Int) = Timestamp.from(base.plusSeconds(sec.toLong))
    val genKT = for { k <- Gen.choose(0L, 2L); s <- Gen.choose(0, 19) } yield (k, s)
    val genRightRow = for {
      kt <- genKT
      v1 <- Gen.option(Gen.choose(0L, 4L))
      v2 <- Gen.option(Gen.choose(0L, 4L))
    } yield (kt._1, kt._2, v1, v2)
    val genLeft = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, genKT))
    val genRight = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, genRightRow))
    val prop = Prop.forAll(genLeft, genRight) { (ls, rs) =>
      val leftRows = ls.zipWithIndex.map { case ((k, s), i) => (k, mkTs(s), i.toLong) }
      val rightRows = rs.map { case (k, s, v1, v2) => (k, mkTs(s), v1, v2) }
      val got = TemporalJoins.asofJoin(
          leftRows.toDF("k", "t", "lid"), rightRows.toDF("k", "rt", "v1", "v2"),
          Seq("k"), "t", "rt", Seq("v1", "v2"))
        .collect().map { r =>
          r.getLong(2) -> (
            (if (r.isNullAt(3)) None else Some(r.getLong(3))),
            (if (r.isNullAt(4)) None else Some(r.getLong(4))))
        }.toMap
      // Reference: latest right row with rt <= t per key; rt ties resolve
      // to the greatest value tuple with None < Some (the documented
      // determinism rule, matching Spark's struct ordering).
      val expected = leftRows.map { case (k, t, lid) =>
        val cands = rightRows.filter(r => r._1 == k && !r._2.after(t))
        lid -> (if (cands.isEmpty) (None, None)
                else { val mx = cands.maxBy(r => (r._2.getTime, r._3, r._4)); (mx._3, mx._4) })
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, s"asof property failed: ${res.status}")
  }

  test("banded range join ScalaCheck property: equals the naive predicate") {
    // The banded rewrite (hour buckets, probe two buckets, exact filter)
    // must count exactly what the naive interval predicate counts.
    // Generator concentrates timestamps near exact hour boundaries —
    // where an off-by-one in bucket assignment or the inclusive/exclusive
    // ends would show.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.operators.TemporalJoins
    val base = Instant.parse("2026-08-12T00:00:00Z")
    // offsets at and around multiples of 3600s
    val genSec = Gen.oneOf(
      Gen.choose(0, 4 * 3600),
      Gen.choose(0, 4).map(_ * 3600),
      Gen.choose(0, 4).map(h => h * 3600 - 1),
      Gen.choose(0, 4).map(h => h * 3600 + 1))
    val genRow = for { u <- Gen.choose(0L, 2L); s <- genSec } yield (u, s)
    val prop = Prop.forAll(
      Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, genRow)),
      Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, genRow))) { (ps, cs) =>
      val purchases = ps.zipWithIndex.map { case ((u, s), i) =>
        (i.toLong, u, Timestamp.from(base.plusSeconds(s.toLong))) }
      val clicks = cs.zipWithIndex.map { case ((u, s), i) =>
        (1000L + i, u, Timestamp.from(base.plusSeconds(s.toLong))) }
      import spark.implicits._
      val got = TemporalJoins.rangeJoinCounts(
          purchases.toDF("event_id", "user_id", "ts"),
          clicks.toDF("event_id", "user_id", "ts"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = purchases.map { case (pid, pu, pt) =>
        pid -> clicks.count { case (_, cu, ct) =>
          cu == pu && ct.after(pt) && ct.getTime <= pt.getTime + 3600 * 1000L
        }.toLong
      }.toMap
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, s"range join property failed: ${res.status}")
  }

  test("interval overlap join ScalaCheck property: equals the naive predicate, exactly once") {
    // The band-cover rewrite must report each overlapping pair EXACTLY
    // once (the canonical-band dedup) and nothing else. Generator favors
    // band-boundary-aligned endpoints, multi-band spans, adjacent
    // (touching, non-overlapping) intervals, and empty intervals.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.functions.col
    val Band = 1000L // micros, small so intervals span many bands
    val genPt = Gen.oneOf(
      Gen.choose(0L, 10L * Band),
      Gen.choose(0L, 10L).map(_ * Band),
      Gen.choose(0L, 10L).map(_ * Band + 1),
      Gen.choose(1L, 10L).map(_ * Band - 1))
    val genIv = for { a <- genPt; b <- genPt } yield (math.min(a, b), math.max(a, b))
    val prop = Prop.forAll(
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, genIv)),
      Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, genIv))) { (ls, rs) =>
      val lrows = ls.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      val rrows = rs.zipWithIndex.map { case ((s, e), i) => (100L + i, s, e) }
      val got = TemporalJoins.intervalOverlapJoin(
          lrows.toDF("lid", "ls", "le"), col("ls"), col("le"),
          rrows.toDF("rid", "rs", "re"), col("rs"), col("re"), Band)
        .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expected = for {
        (lid, s1, e1) <- lrows
        (rid, s2, e2) <- rrows
        // half-open overlap — the textbook s1<e2 && s2<e1 is only valid
        // for NON-empty intervals (an empty [x,x) satisfies it against
        // any interval containing x but holds no points), so empties are
        // excluded explicitly, matching the operator's filter
        if e1 > s1 && e2 > s2 && s1 < e2 && s2 < e1
      } yield (lid, rid)
      got.sorted == expected.sorted && got.distinct.size == got.size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, s"interval overlap property failed: ${res.status}")
  }

  test("interval overlap: one pathological interval fails with the interval named") {
    import org.apache.spark.sql.functions.col
    // an open-ended interval encoded as Long.MaxValue would explode into
    // ~9e12 bands — sequence() would throw its opaque max-array-length
    // error (or allocate gigabytes); the guard must name the row instead
    val l = Seq((1L, 0L, 2000L), (2L, 500L, Long.MaxValue)).toDF("lid", "ls", "le")
    val r = Seq((100L, 0L, 1000L)).toDF("rid", "rs", "re")
    val e = intercept[Throwable] {
      TemporalJoins.intervalOverlapJoin(
        l, col("ls"), col("le"), r, col("rs"), col("re"), 1000L).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(6)
      .map(t => String.valueOf(t.getMessage)).mkString("\n")
    assert(msgs.contains("intervalOverlapJoin") && msgs.contains("[500, 9223372036854775807)"),
      s"guard must fail with the offending interval named, got: $msgs")

    // sane rows are untouched by the guard, and a caller may widen the cap
    val ok = TemporalJoins.intervalOverlapJoin(
        l.filter(col("lid") === 1L), col("ls"), col("le"),
        r, col("rs"), col("re"), 1000L)
      .select("lid", "rid").collect().map(r0 => (r0.getLong(0), r0.getLong(1)))
    assert(ok.toSeq === Seq((1L, 100L)))
    val widened = TemporalJoins.intervalOverlapJoin(
        Seq((3L, 0L, 5000L)).toDF("lid", "ls", "le"), col("ls"), col("le"),
        r, col("rs"), col("re"), bandMicros = 1L, maxBandsPerRow = 10000L)
      .select("lid", "rid").collect()
    assert(widened.length === 1, "a widened cap must admit the long interval")
  }

  test("as-of join: NULL value in the matched right row is preserved, not skipped") {
    val left = Seq((1L, ts("2026-01-01T15:00:00Z"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2026-01-01T12:00:00Z"), Some("a")),
      (1L, ts("2026-01-01T14:00:00Z"), None: Option[String])
    ).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v")).collect()
    assert(out.length === 1 && out(0).isNullAt(2),
      "the latest preceding right row has v=NULL; an earlier row's value must not leak through")
  }

  test("as-of join: multiple value columns come from ONE right row, never stitched") {
    val left = Seq((1L, ts("2026-01-01T15:00:00Z"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2026-01-01T12:00:00Z"), Some(1L), None: Option[Long]),
      (1L, ts("2026-01-01T14:00:00Z"), None: Option[Long], Some(2L))
    ).toDF("k", "rt", "v1", "v2")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v1", "v2")).collect()(0)
    assert(out.isNullAt(2) && out.getLong(3) === 2L,
      "values must be the latest row's (NULL, 2), not a cross-row (1, 2) stitch")
  }
}
