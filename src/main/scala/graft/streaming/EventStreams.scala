package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DoubleType

/** Per-user sessionizer state: last event time + current session number.
  * Top-level (not nested/private) so the streaming state encoder can
  * construct it from generated code. */
final case class SessionState(lastTsMicros: Long, sessionId: Long)

/** Structured Streaming twins of the `graft.operators.EventOps` batch
  * queries (SURVEY §2.10 T4). The reference has no streaming — these are
  * north-star extensions: the same logical shapes as the batch operators,
  * expressed so one function serves both execution modes (`window` /
  * `session_window` evaluate identically over batch DataFrames and
  * streaming sources; the watermark only takes effect when the input is a
  * stream).
  *
  * Usage (streaming): `spark.readStream...` → `hourlyAgg(df)` →
  * `writeStream.outputMode("append")` once the watermark closes windows.
  * Usage (batch): `hourlyAgg(Tables.events(spark, dir))` — verified
  * equivalent to the batch EventOps results in StreamingSpec.
  *
  * Scale: both are single-shuffle keyed aggregations; state size is
  * bounded by the watermark horizon (2h of hourly windows / open sessions
  * per user), so a 1000-executor cluster holds state proportional to the
  * key cardinality, not the stream length.
  */
object EventStreams {
  /** Every micro-batch seam below runs under this lock-wait FLOOR
    * (graft.sources.StoreLock.withWaitFloor): a maintenance sweep
    * holding a store for seconds must DELAY a streaming batch, not kill
    * the streaming query under the fail-fast default — and the floor
    * reaches every claim the batch takes, including the ones inside
    * Pipeline.ingestDocs/forgetDocs and the per-store append faces
    * (r16 advice, widened from the gate-admit claim to the whole
    * streaming admission plane in the r17 review). Past the floor a
    * batch still fails loudly naming the holder — a wedged sweep is an
    * operator incident, and foreachBatch's at-least-once replay re-runs
    * the batch idempotently after restart. */
  private val StreamLockWaitFloorMs = 30000L
  private def flooredBatch[T](body: => T): T =
    graft.sources.StoreLock.withWaitFloor(StreamLockWaitFloorMs)(body)


  /** Hourly windowed counts + decimal-exact value sums — the streaming twin
    * of EventOps.qWindowHourly (same decimal accumulation so results are
    * order/trigger independent). */
  def hourlyAgg(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast(DoubleType).as("sum_value"))
      .select(col("win.start").as("hour_ts"), col("event_type"), col("n"), col("sum_value"))

  /** Gap-based sessions via `session_window` (30-min gap, matching
    * EventOps.qSessionize's GapUs): one row per (user, session) with its
    * bounds and event count. Batch qSessionize numbers sessions per user;
    * this emits the session intervals themselves — the two agree on
    * session membership (asserted in StreamingSpec). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup — the stream twin of `Dedup.qDedupExact` for a
    * continuously-arriving corpus: drop any document whose 128-bit content
    * hash has already been seen within the watermark horizon. State is one
    * small hash row per distinct document inside the horizon, so it is
    * bounded by arrival rate × horizon, never by stream length — the only
    * formulation of streaming dedup that survives an unbounded stream.
    *
    * Survivorship differs from batch by necessity: a stream keeps the
    * FIRST arrival (it cannot know a smaller doc_id comes later), while
    * the batch query keeps min doc_id. The deduped content set is
    * identical — asserted against the batch twin in StreamingSpec.
    * Batch inputs take the plain `dropDuplicates` path (Spark rejects
    * `dropDuplicatesWithinWatermark` outside streaming).
    */
  def dedupDocs(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    val hashed = docs.withColumn("text_hash", md5(col("text").cast("binary")))
    if (docs.isStreaming)
      hashed.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark("text_hash")
    else hashed.dropDuplicates("text_hash")
  }

  /** Stream-stream interval join — the streaming twin of the banded range
    * join (`TemporalJoins.qRangeJoinClicks`): each purchase matched with
    * the same user's clicks in the following hour, both sides arriving as
    * streams. The watermarks are what make this feasible at all: Spark
    * buffers each side's rows as join state, and the event-time range
    * condition plus the watermark lets it PROVE a buffered click older
    * than (watermark − 1 h) can never match a future purchase — state is
    * evicted instead of growing with the stream. Works identically over
    * batch frames (watermarks are no-ops there); StreamingSpec asserts
    * the micro-batched result equals the batch join on the same rows.
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame =
    purchases.withWatermark("p_ts", watermarkDelay)
      .join(clicks.withWatermark("c_ts", watermarkDelay),
        expr("""p_user_id = c_user_id AND
               |c_ts > p_ts AND
               |c_ts <= p_ts + INTERVAL 1 HOUR""".stripMargin))

  /** Streaming ingest gate over the dedup signature store — the stream
    * twin of the batch gate→admit→append loop (`Dedup.qDedupGate` +
    * `appendSignatures`): each micro-batch of (doc_id, text) documents is
    * gated against the STORED corpus signatures with the batch gate
    * (foreachBatch is the standard shape for running batch-only logic —
    * the capping window, the shard-collect — per micro-batch), the gate
    * verdicts append to `outPath`, and the batch's accepted signatures
    * append to the store, so batch N+1 is gated against everything
    * admitted through batch N. Bootstrap the store with
    * `Dedup.writeSignatures` over the existing corpus before starting.
    *
    * Contract notes: duplicates WITHIN one micro-batch are the batch
    * self-join's domain (`qDedupNgram`) — the gate's face is
    * incoming-vs-corpus, so two copies arriving in the same batch both
    * pass (and the store then holds both signatures). Docs whose
    * normalized text has fewer than 3 words carry no n-gram signature:
    * they get an explicit verdict row (0.0 / not duplicate — the
    * streaming exact dedup `dedupDocs` is their stage) but are never
    * admitted to the store. At 100 TB the per-batch work is the point:
    * one shard-pruned store read per batch, never a corpus rescan, and
    * admissions land as new batch-scoped partition dirs.
    *
    * Replay-safe by construction (foreachBatch is at-least-once): the
    * gate reads only `batch_id < id` store rows, so a replayed batch
    * never gates against its own prior admissions (verdicts are
    * identical on replay), and both writes are dynamic partition
    * overwrites keyed by batch_id, so a replay rewrites its own
    * partitions instead of appending duplicates.
    */
  def gateDocStream(docs: DataFrame, storePath: String, outPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        gateBatch(batch.toDF(), id, storePath, outPath)
      }
      .start()

  /** One micro-batch of the ingest gate — the foreachBatch body, exposed
    * so the replay contract is TESTABLE: running gateBatch twice with the
    * same id (exactly what an at-least-once crash-replay does) must leave
    * verdicts and store bit-identical to running it once (StreamingSpec
    * asserts this by literally replaying a batch). */
  def gateBatch(batch: DataFrame, id: Long, storePath: String, outPath: String): Unit =
      flooredBatch {
    import graft.operators.Dedup
    import graft.sources.Sinks
    val sig = Dedup.signaturesOf(batch)
      .withColumn("batch_id", lit(id)).persist()
    try {
      val gated = Dedup.gateAgainstStored(batch.sparkSession, storePath, sig,
        corpusFilter = col("batch_id") < id, ordered = false).persist()
      try {
        val verdicts = batch.select("doc_id").distinct()
          .join(gated, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
            coalesce(col("n_dup_matches"), lit(0L)).as("n_dup_matches"),
            coalesce(col("is_duplicate"), lit(0)).as("is_duplicate"),
            lit(id).as("batch_id"))
        Sinks.overwritePartitionsDynamic(verdicts, outPath, Seq("batch_id"))
        val accepted = gated.filter(col("is_duplicate") === 0).select("doc_id")
        // the store mutation section runs under the store's writer
        // claim (StoreLock) — the stream is the one writer by protocol,
        // but a concurrently-launched compaction or forget serializes
        // against the micro-batch instead of racing its swap; the
        // enclosing flooredBatch scope gives this claim (like every
        // streaming admit claim) the 30 s contention-wait floor.
        graft.sources.StoreLock.withLock(storePath, "gate-admit") {
          // keep the Bloom sidecar a superset of stored buckets BEFORE
          // the admission lands (Dedup.absorbIntoBloom's soundness
          // ordering); the whole batch's buckets over-approximate the
          // accepted set, which only costs false-positive bits
          Dedup.absorbIntoBloom(batch.sparkSession, storePath, sig.select("bucket"))
          // same superset ordering for the ingest guard's id-membership
          // sidecar (no-op while absent)
          graft.sources.IdBloom.absorb(batch.sparkSession, storePath,
            sig.select("doc_id"))
          Sinks.overwritePartitionsDynamic(sig.join(accepted, "doc_id"),
            storePath, Seq("shard", "batch_id"))
        }
      } finally gated.unpersist()
    } finally sig.unpersist()
  }

  /** Streaming vector ingest into a stored IVF index — the stream twin
    * of the batch bootstrap→append flow
    * ([[graft.operators.Similarity.writeIvfIndexFrom]] +
    * [[graft.operators.Similarity.appendIvfIndexBatch]]): bootstrap the
    * index over the existing corpus first (the quantizer is trained
    * there and stays FIXED through every streamed append — production
    * IVF semantics), then each arriving micro-batch of
    * (vec_id, embedding) vectors is assigned under the stored quantizer
    * and lands as a dynamic overwrite of its (list_id, batch_id)
    * partitions. Probes see new vectors immediately through the same
    * partition pruning — no rebuild, no retrain.
    *
    * Replay-safe by construction (foreachBatch is at-least-once): a
    * replayed batch rewrites its own still-identical partitions, leaving
    * the index bit-identical (StreamingSpec replays a batch literally
    * and diffs the index). */
  def ingestVectorStream(vectors: DataFrame, indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        ingestVectorBatch(batch.toDF(), id, indexPath)
      }
      .start()

  /** One micro-batch of the vector ingest — the foreachBatch body,
    * exposed so the replay contract is testable the way [[gateBatch]]'s
    * is: running it twice with the same id must leave the index
    * bit-identical to running it once. */
  def ingestVectorBatch(batch: DataFrame, id: Long, indexPath: String): Unit =
    flooredBatch(
      graft.operators.Similarity.appendIvfIndexBatch(batch.sparkSession, batch, indexPath, id))

  /** Stream (doc_id, text) documents into a STORED search index
    * (bootstrap via [[graft.operators.Search.writeSearchIndex]]): each
    * micro-batch's postings land as a dynamic overwrite of their
    * (shard, batch_id) partitions and its stats row overwrites its own
    * sidecar partition, so an at-least-once replay rewrites itself —
    * the [[ingestVectorStream]] contract, applied to the lexical index.
    * BM25 probes see streamed documents immediately (df and global
    * stats derive from what the probe reads; nothing is cached at
    * write time), asserted in StreamingSpec. */
  def ingestPostingsStream(docs: DataFrame, indexPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        ingestPostingsBatch(batch.toDF(), id, indexPath)
      }
      .start()

  /** One micro-batch of the posting ingest — exposed for the replay
    * contract, like [[ingestVectorBatch]]. */
  def ingestPostingsBatch(batch: DataFrame, id: Long, indexPath: String): Unit =
    flooredBatch(
      graft.operators.Search.appendSearchIndexBatch(batch.sparkSession, batch, indexPath, id))

  /** Highest micro-batch id the streaming checkpoint's commit log
    * records as COMMITTED, or -1 when none have. This is the fact a
    * compaction watermark actually rests on: across a restart,
    * Structured Streaming re-executes only batches ABOVE it (a batch
    * whose offsets were planned but whose commit never landed), so
    * `committedWatermark + 1` is exactly the largest safe `foldBelow`
    * for the batch-scoped stores — asserted by the caller no longer,
    * derived from the engine's own ledger. Reads
    * `checkpointDir/commits` through the Hadoop FS API; the listing is
    * control-plane-sized (one entry per committed micro-batch, and
    * [[compactPostingsFromCheckpoint]] folds store partitions at the
    * same cadence, so neither grows unboundedly). Metadata-log temp
    * files (`.<id>.tmp`) are non-numeric and skipped. */
  def committedWatermark(s: SparkSession, checkpointDir: String): Long = {
    val commits = new org.apache.hadoop.fs.Path(checkpointDir, "commits")
    val fs = commits.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(commits)) -1L
    else fs.listStatus(commits).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .foldLeft(-1L)((m, n) => math.max(m, n.toLong))
  }

  /** [[graft.operators.Search.compactSearchIndex]] with the watermark
    * DERIVED from the ingest stream's checkpoint instead of asserted by
    * the caller: folds exactly the batches the commit log proves can
    * never be replayed (ids ≤ [[committedWatermark]]), and leaves any
    * planned-but-uncommitted batch scoped so the restart's replay
    * rewrites it idempotently (StreamingSpec stages that crash window
    * literally). Run between micro-batches / while the stream is
    * stopped, like every store compaction here. */
  def compactPostingsFromCheckpoint(s: SparkSession, indexPath: String,
      checkpointDir: String): Unit =
    graft.operators.Search.compactSearchIndex(s, indexPath,
      foldBelow = committedWatermark(s, checkpointDir) + 1)

  /** Streaming LM ingest: each micro-batch of (doc_id, text) documents
    * lands its bigram counts and word set as the batch's partitions of
    * the stored LM ([[graft.operators.TextOps.appendLmBatch]] — additive
    * counts, vocab union at load), so the quality gate's model tracks
    * the corpus continuously. Replay-idempotent like every batch-scoped
    * store here (a re-executed micro-batch overwrites its own
    * partitions); compaction derives its watermark from the SAME
    * checkpoint via [[compactLmFromCheckpoint]]. Bootstrap the model
    * with `writeLmModel` over the existing corpus before starting. */
  def ingestLmStream(docs: DataFrame, modelPath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        ingestLmBatch(batch.toDF(), id, modelPath)
      }
      .start()

  /** One micro-batch of the LM ingest — the replay-contract seam. */
  def ingestLmBatch(batch: DataFrame, id: Long, modelPath: String): Unit =
    flooredBatch(
      graft.operators.TextOps.appendLmBatch(batch.sparkSession, batch, modelPath, id))

  /** [[compactPostingsFromCheckpoint]] for the stored LM. */
  def compactLmFromCheckpoint(s: SparkSession, modelPath: String,
      checkpointDir: String): Unit =
    graft.operators.TextOps.compactLmModel(s, modelPath,
      foldBelow = committedWatermark(s, checkpointDir) + 1)

  /** Streaming DELETION — the ingest loops' inverse, closing the
    * continuous lifecycle: each micro-batch of (doc_id, text) deletion
    * requests (the GDPR-delete queue a deployment actually operates)
    * retracts the docs from EVERY configured store via
    * [[graft.operators.Pipeline.forgetDocs]]. Replay safety needs no
    * batch-id bookkeeping here, unlike the ingest loops: every
    * component retraction is already replay-IDEMPOTENT at the store
    * layer (sidecar `distinct` / per-doc fold), so an at-least-once
    * re-execution of a micro-batch converges by construction — the
    * ForgetSpec resume contract, arriving one micro-batch at a time.
    * The model-store retractions need the document TEXT, which is why
    * the deletion stream carries it (the deleting party holds the doc
    * being deleted — [[graft.operators.TextOps.retractLmDocs]]'
    * contract). */
  def forgetDocStream(docs: DataFrame,
      stores: graft.operators.Pipeline.DocStores,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        forgetBatch(batch.toDF(), id, stores)
      }
      .start()

  /** One micro-batch of the deletion loop — the replay-contract seam
    * (StreamingSpec literally re-runs a batch). Empty micro-batches
    * no-op: a quiet deletion queue must not trip forgetDocs'
    * empty-request guard. */
  def forgetBatch(batch: DataFrame, id: Long,
      stores: graft.operators.Pipeline.DocStores): Unit =
    if (!batch.isEmpty)
      flooredBatch(graft.operators.Pipeline.forgetDocs(batch.sparkSession, stores, batch))

  /** Streaming corpus ingest into every configured store — the stream
    * twin of [[graft.operators.Pipeline.ingestDocs]] and the admission
    * counterpart of [[forgetDocStream]]: each micro-batch of documents
    * lands in all five store families under the MICRO-BATCH ID as its
    * admission batch id, so the at-least-once replay contract and the
    * store-side batch-scoping convention are one and the same (the
    * gateDocStream argument, composed across the families — every
    * component write is a dynamic overwrite of the batch's own
    * partitions). `vectorsFor` derives a batch's embedding frame when
    * vector stores are routed (compute-or-join is the caller's
    * pipeline; the engine only demands vec_id ≡ doc_id).
    *
    * One checkpointed stream per store lineage: a FRESH checkpoint
    * restarts micro-batch ids at 0, and re-using a batch-id space
    * against grown stores is exactly the cross-batch-disjointness
    * violation the posting store's guard then refuses loudly. The
    * re-ingest rule applies per batch too — a batch carrying ids with
    * pending retractions fails the stream rather than silently
    * re-admitting half-forgotten docs; sequencing deletion queues and
    * ingest feeds around compaction is pipeline policy the engine must
    * not reorder. */
  def ingestDocStream(docs: DataFrame,
      stores: graft.operators.Pipeline.DocStores,
      checkpointDir: String,
      vectorsFor: DataFrame => Option[DataFrame] = _ => None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        ingestBatch(batch.toDF(), id, stores, vectorsFor)
      }
      .start()

  /** One micro-batch of the ingest loop — the replay-contract seam
    * ([[forgetBatch]]'s discipline; StreamingSpec re-runs a batch
    * verbatim). Empty micro-batches no-op. */
  def ingestBatch(batch: DataFrame, id: Long,
      stores: graft.operators.Pipeline.DocStores,
      vectorsFor: DataFrame => Option[DataFrame] = _ => None): Unit =
    if (!batch.isEmpty)
      flooredBatch(graft.operators.Pipeline.ingestDocs(batch.sparkSession, stores, batch,
        batchId = id, vectors = vectorsFor(batch)))

  // ---- custom state: flatMapGroupsWithState ------------------------------

  final case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)
  final case class SessionAssign(user_id: Long, event_id: Long, ts: Timestamp, session_id: Long)

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Gap sessionization with STABLE per-user session numbers (1, 2, …) —
    * what the batch lag-gap query emits and what `session_window` cannot
    * (it produces intervals, not counters). This is the
    * `flatMapGroupsWithState` custom-state shape: per-user state =
    * (last event time, current session number), carried across
    * micro-batches; each batch's events for a user are ordered in memory
    * before assignment (per-group, bounded by batch size).
    *
    * State is BOUNDED by the watermark horizon: the input is watermarked
    * on `ts`, and a user whose last event sits more than
    * `idleTimeoutMinutes` behind the advancing watermark has their state
    * evicted (EventTimeTimeout — processing-time timeouts would keep the
    * trigger loop busy forever and break `processAllAvailable`). Without
    * eviction, one SessionState per user EVER SEEN accumulates for the
    * lifetime of the query. The trade is explicit: an evicted user who
    * returns restarts numbering at 1 (their next event opens a new
    * session either way — only the counter origin resets), so size the
    * timeout well above the session gap.
    *
    * Works identically over a batch Dataset (watermark is a no-op, each
    * group arrives complete in one call, timeouts never fire — asserted
    * equal to the lag-gap query in StreamingSpec) and over a stream,
    * where correctness across micro-batches relies on per-user
    * event-time order across batches (the usual replay contract;
    * out-of-order streams need the watermarked session_window variant).
    */
  final case class TokenEvent(lang: String, word: String, seq: Long)
  final case class HhCandidate(lang: String, word: String, freq_floor: Long)
  final case class MgSnapshot(counts: Map[String, Long])

  /** Streaming frequent-items: the batch `graft_mg` sketch's stateful
    * twin. Per-language state = the Misra-Gries counter map
    * ([[graft.functions.MgBuf]] — ONE sketch implementation for both
    * faces, the DocHashes contract), carried across micro-batches;
    * each batch's tokens re-enter the SAME buffer, so the stream-long
    * result is exactly a sequential MG fold over the concatenated
    * batches (StreamingSpec asserts it against a driver-side fold).
    * Every batch emits the group's refreshed candidate set (Update
    * mode) — the continuously-maintained "trending terms" view.
    *
    * State is BOUNDED BY CONSTRUCTION: at most `capacity` counters per
    * language ever exist, so unlike the sessionizer there is no
    * timeout/eviction trade — the sketch IS the eviction policy. The
    * MG guarantee degrades gracefully over an unbounded stream: items
    * with frequency > n/(capacity+1) of the stream SO FAR are always
    * held. In-batch order is pinned by `seq` (the replay contract);
    * cross-batch order is arrival order, and the candidate GUARANTEE
    * (unlike the counter values) is order-independent.
    */
  def heavyHittersStateful(tokens: Dataset[TokenEvent],
      capacity: Int = 200): Dataset[HhCandidate] = {
    import tokens.sparkSession.implicits._
    tokens.groupByKey(_.lang)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (lang: String, it: Iterator[TokenEvent], state: GroupState[MgSnapshot]) =>
          val buf = new graft.functions.MgBuf(capacity)
          state.getOption.foreach(s => buf.seed(s.counts))
          it.toSeq.sortBy(e => (e.seq, e.word)).foreach(e => buf.offer(e.word))
          state.update(MgSnapshot(buf.snapshot))
          buf.sorted.iterator.map { case (w, c) => HhCandidate(lang, w, c) }
      }
  }

  final case class AnomalyEvent(event_type: String, ts: Timestamp)
  final case class AnomalyState(hours: Seq[(Long, Long)], lastEmittedUs: Long)
  final case class AnomalyVerdict(event_type: String, hour_ts: Timestamp,
    n: Long, base_c: Long, base_s: Long, anomalous: Int)

  /** Streaming hourly-volume anomaly detection — the stateful twin of
    * [[graft.operators.EventOps.qAnomaly]], emitting each completed
    * hour's 3σ verdict as soon as the NEXT hour's first event arrives
    * (an hour is final once a later hour exists — the same
    * per-key event-time-order contract the sessionizer and SCD2 twins
    * document; the stream's LAST hour stays open in state, exactly as a
    * windowed aggregate holds its last window until the watermark
    * closes it). Per-type state = the trailing PRESENT hours' counts —
    * the batch face's baseline is a rows-window over existing hour
    * rows, not a calendar range, so gap hours must not pad the
    * baseline — trimmed to the 25 most recent (24 baseline + the open
    * hour), which BOUNDS state by construction: ≤ 25 (hour, count)
    * pairs per event type, ever. The verdict arithmetic is the batch
    * face's integer z² test verbatim (one shared set of constants), so
    * the streamed verdicts equal the batch query on the same events
    * row-for-row (StreamingSpec asserts it, spike included). */
  def anomalyStateful(events: Dataset[AnomalyEvent]): Dataset[AnomalyVerdict] = {
    import events.sparkSession.implicits._
    val HourUs = 3600L * 1000000L
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[AnomalyEvent], state: GroupState[AnomalyState]) =>
          val prev = state.getOption.getOrElse(AnomalyState(Nil, Long.MinValue))
          val m = scala.collection.mutable.TreeMap.empty[Long, Long]
          prev.hours.foreach { case (h, n) => m.update(h, n) }
          it.foreach { e =>
            val h = micros(e.ts) - java.lang.Math.floorMod(micros(e.ts), HourUs)
            m.update(h, m.getOrElse(h, 0L) + 1L)
          }
          if (m.isEmpty) Iterator.empty
          else {
            val hours = m.keys.toVector
            val maxH = hours.last
            val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyVerdict]
            hours.zipWithIndex.foreach { case (h, i) =>
              if (h > prev.lastEmittedUs && h < maxH) {
                val base = hours.slice(math.max(0, i - 24), i).map(m)
                val c = base.size.toLong
                val sSum = base.sum
                val q = base.map(x => x * x).sum
                val n = m(h)
                val anomalous =
                  if (c >= graft.operators.EventOps.AnomalyMinBase &&
                    (n * c - sSum) * (n * c - sSum) >
                      graft.operators.EventOps.AnomalyZsq * (q * c - sSum * sSum)) 1
                  else 0
                out += AnomalyVerdict(tpe, new Timestamp(h / 1000L), n, c, sSum, anomalous)
              }
            }
            val lastEmitted = math.max(prev.lastEmittedUs,
              hours.filter(_ < maxH).lastOption.getOrElse(Long.MinValue))
            state.update(AnomalyState(
              hours.takeRight(25).map(h => (h, m(h))), lastEmitted))
            out.iterator
          }
      }
  }

  final case class TypedEvent(user_id: Long, event_type: String, ts: Timestamp, event_id: Long)
  final case class Scd2State(currentType: String, validFrom: Timestamp, version: Long)
  final case class Scd2Closed(user_id: Long, event_type: String,
      valid_from: Timestamp, valid_to: Timestamp, version: Long)

  /** Streaming SCD2: the stateful twin of
    * [[graft.operators.EventOps.scd2Of]]. Per-user state is the OPEN
    * version (current attribute value, its valid_from, its ordinal); an
    * arriving change CLOSES it — the closed version row is emitted with
    * its valid_to — and opens the next. Restatements (an event carrying
    * the current value) emit nothing, exactly the batch build's
    * collapse rule. The open version is state, not output: it has no
    * valid_to yet, and a restart from the checkpoint resumes it instead
    * of re-opening version 1 (StreamingSpec proves the carry and pins
    * the emitted rows to the batch build's closed rows). In-batch order
    * is (ts, event_id), the batch face's ordering contract; state is
    * one row per user, bounded by user cardinality like the
    * sessionizer.
    *
    * Cross-batch LATE events (ts strictly before the open version's
    * valid_from) are DROPPED, not applied: applying one would emit an
    * inverted interval (valid_to < valid_from) and silently corrupt the
    * history. An SCD2 build is inherently order-sensitive — in-batch
    * disorder is healed by the (ts, event_id) sort, but an event older
    * than an already-opened version cannot be spliced into emitted
    * output. Deployments with cross-batch disorder run the batch face
    * ([[graft.operators.EventOps.scd2Of]]) over compacted data instead;
    * StreamingSpec pins the drop rule. */
  def scd2Stateful(events: Dataset[TypedEvent]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[TypedEvent], state: GroupState[Scd2State]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Closed]
          sorted.foreach { e =>
            if (st == null)
              st = Scd2State(e.event_type, e.ts, 1L)
            else if (micros(e.ts) < micros(st.validFrom)) {
              // late arrival from a prior batch: dropping it keeps every
              // emitted interval well-formed (see the contract above)
            } else if (st.currentType != e.event_type) {
              out += Scd2Closed(user, st.currentType, st.validFrom, e.ts, st.version)
              st = Scd2State(e.event_type, e.ts, st.version + 1L)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  def sessionizeStateful(events: Dataset[SessionEvent], gapMinutes: Int = 30,
      idleTimeoutMinutes: Long = 120, watermarkDelay: String = "10 minutes"): Dataset[SessionAssign] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
            val out = sorted.map { e =>
              val tsUs = micros(e.ts)
              val newSession = st.sessionId == 0L || tsUs - st.lastTsMicros > gapUs
              st = SessionState(tsUs, if (newSession) st.sessionId + 1 else st.sessionId)
              SessionAssign(user, e.event_id, e.ts, st.sessionId)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastTsMicros / 1000L + idleTimeoutMinutes * 60000L)
            out.iterator
          }
      }
  }
}
