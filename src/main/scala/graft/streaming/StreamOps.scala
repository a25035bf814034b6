package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators for the events pipeline — the streaming
  * twins of the batch OpsEvents queries, built on the engine's state-store
  * primitives so the same logic runs over an unbounded source:
  *
  *  - tumbling window aggregation: watermark + `window()` groupBy — state is
  *    bounded by the watermark, partial aggregation happens map-side exactly
  *    as in batch;
  *  - exact dedup: `dropDuplicates` keyed on (keys, event-time) under a
  *    watermark, so the dedup state ages out instead of growing forever;
  *  - gap sessionization: custom per-key state via flatMapGroupsWithState —
  *    the canonical "semantics Spark's built-ins can't express" case
  *    (SURVEY §7 preference (c) applies to plans; for streaming state the
  *    blessed extension point is the GroupState API, used here).
  *
  * Scale design: every operator keys state by a high-cardinality column
  * (user, dedup key) so the state store shards evenly across executors;
  * watermarks bound state size; nothing ever collects to the driver.
  */
object StreamOps {

  /** Input projection for sessionization. */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Open-session accumulator kept in the state store (µs timestamps). */
  case class OpenSession(startUs: Long, endUs: Long, n: Long, value: Double)

  /** Emitted closed session. */
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long,
                     session_value: Double)

  private def usOf(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
  private def tsOf(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Tumbling-window event counts under a watermark — streaming twin of the
    * batch date_bin aggregation (OpsEvents events_tumbling). */
  def tumblingCounts(events: DataFrame, windowDur: String,
                     watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup: duplicates of (keys) arriving within the
    * watermark horizon are dropped; keying the state on the event-time
    * column as well lets the store evict aged entries — without it the
    * state grows with every distinct key forever. */
  def dedupExact(events: DataFrame, keys: Seq[String],
                 eventTimeCol: String = "ts",
                 watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicates(keys :+ eventTimeCol)

  /** Gap sessionization with custom state: events group per user; a session
    * closes when the event-time gap exceeds `gapMinutes` (emitted from the
    * batch-side split) or when the watermark passes the session end + gap
    * (emitted by event-time timeout). Append-mode output — each session is
    * emitted exactly once, when it can no longer grow. Mirrors the batch
    * window/lag formulation in OpsEvents.sessionize. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 watermarkDelay: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L

    events.select(col("user_id"), col("ts"), col("value")).as[Ev]
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap: the open session can't grow — emit
            val s = state.get
            state.remove()
            Iterator.single(
              Session(user, tsOf(s.startUs), tsOf(s.endUs), s.n, s.value))
          } else {
            // merge this batch's events (sorted by event time) into the
            // open session, splitting on gaps; emit every closed session
            val evs = it.toIndexedSeq.sortBy(e => usOf(e.ts))
            var closed = List.empty[Session]
            var open = state.getOption
            evs.foreach { e =>
              val t = usOf(e.ts)
              open match {
                // late-but-within-watermark events can precede the open
                // session's start — extend both bounds, not just the end
                case Some(s) if t - s.endUs <= gapUs =>
                  open = Some(OpenSession(math.min(s.startUs, t),
                    math.max(s.endUs, t), s.n + 1, s.value + e.value))
                case Some(s) =>
                  closed ::= Session(user, tsOf(s.startUs), tsOf(s.endUs),
                    s.n, s.value)
                  open = Some(OpenSession(t, t, 1, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // must be beyond the current watermark or the store rejects it
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1,
                  s.endUs / 1000L + gapMs))
            }
            closed.reverseIterator
          }
      }
  }

  /** Event projection carried through Bloom dedup (fp = key fingerprint). */
  case class BEv(fp: Long, event_id: Long, user_id: Long,
                 ts: java.sql.Timestamp, event_type: String)

  /** Bloom shard state: fixed-size bitset + accepted-insert count. */
  case class BloomShard(bits: Array[Byte], n: Long)

  /** Shared Bloom sieve core used by [[bloomDedup]] and
    * [[segmentBloomDedup]]: test-and-set each row's 64-bit fingerprint
    * against the shard's bitset IN THE GIVEN ORDER, keep definitely-new
    * rows, update the group state. Positions come from Kirsch–Mitzenmacher
    * double hashing over two independent murmur3-finalizer mixes — every
    * output bit depends on every fingerprint bit, so keys agreeing in
    * fp's low bits do not alias (positions are taken mod mBits). */
  private def bloomSieve[T](rows: IndexedSeq[T],
                            state: GroupState[BloomShard],
                            mBits: Int, kHashes: Int)
                           (fp: T => Long): Iterator[T] = {
    val st = state.getOption.getOrElse(
      BloomShard(new Array[Byte](mBits / 8), 0L))
    val bits = st.bits.clone()
    var n = st.n
    val out = scala.collection.mutable.ListBuffer.empty[T]
    val pos = new Array[Int](kHashes)
    def fmix64(x0: Long): Long = {
      var x = x0 ^ (x0 >>> 33)
      x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
      x *= 0xC4CEB9FE1A85EC53L; x ^ (x >>> 33)
    }
    rows.foreach { r =>
      val f = fp(r)
      val h1 = fmix64(f)
      val h2 = fmix64(f ^ 0x9E3779B97F4A7C15L) | 1L
      var seen = true
      var i = 0
      while (i < kHashes) {
        val p = (((h1 + i * h2) % mBits + mBits) % mBits).toInt
        pos(i) = p
        if ((bits(p >> 3) & (1 << (p & 7))) == 0) seen = false
        i += 1
      }
      if (!seen) {
        i = 0
        while (i < kHashes) {
          val p = pos(i)
          bits(p >> 3) = (bits(p >> 3) | (1 << (p & 7))).toByte
          i += 1
        }
        n += 1
        out += r
      }
    }
    state.update(BloomShard(bits, n))
    out.iterator
  }

  /** Streaming dedup with BOUNDED state — the streaming twin of the batch
    * Bloom-prefiltered incremental dedup (Dedup.bloomIncremental), and the
    * 100 TB answer to `dropDuplicates`' unbounded key-set state: total
    * state is exactly nShards × mBits/8 bytes FOREVER, regardless of
    * stream volume, so no watermark-eviction compromise is needed to keep
    * the store finite. Semantics are one-sided like every Bloom use in
    * this repo: a definitely-new key always passes (full dup recall — a
    * true duplicate's bits are all set by its first occurrence), a key may
    * be falsely "seen" with probability set by the m/n sizing (the only
    * approximation; size mBits for the expected distinct-key budget).
    * Events shard by fingerprint so the state store spreads evenly across
    * executors; within a micro-batch events apply in (event-time,
    * event_id) order so replay is deterministic. */
  def bloomDedup(events: DataFrame, keys: Seq[String], nShards: Int = 64,
                 mBits: Int = 1 << 16, kHashes: Int = 5): Dataset[BEv] = {
    require(Integer.bitCount(nShards) == 1, "nShards must be a power of two")
    require(mBits % 8 == 0, "mBits must be byte-aligned")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(xxhash64(keys.map(col): _*).as("fp"), col("event_id"),
        col("user_id"), col("ts"), col("event_type")).as[BEv]
      .groupByKey(e => (e.fp & (nShards - 1)).toInt)
      .flatMapGroupsWithState[BloomShard, BEv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[BEv], state: GroupState[BloomShard]) =>
          bloomSieve(it.toIndexedSeq.sortBy(e => (usOf(e.ts), e.event_id)),
            state, mBits, kHashes)(_.fp)
      }
  }

  /** Exploded segment row for streaming segment dedup. */
  case class SegRow(fp: Long, doc_id: Long, chunk_ix: Long,
                    chunk_text: String)

  /** Streaming twin of `Dedup.segmentDedup`: documents arrive on an
    * unbounded stream, each micro-batch explodes into fixed-`segWords`
    * word segments, and a segment whose fingerprint the corpus has
    * already emitted is dropped — CCNet line-dedup as a continuous
    * ingestion filter. State is the same sharded Bloom battery as
    * [[bloomDedup]]: fixed `nShards × mBits` bits FOREVER, no watermark
    * tradeoff, mergeable across restarts. Within a micro-batch segments
    * process in (doc_id, chunk_ix) order, so the batch-mode min-(doc,seg)
    * canonicalization is reproduced exactly for same-batch duplicates.
    * Bloom false positives can over-drop a genuinely new segment at the
    * configured fpp — the safe direction for dedup (never a duplicate
    * emitted twice); size mBits for the corpus like the batch
    * bloomIncremental path. Emits surviving (doc, segment) rows; per-doc
    * reassembly is a downstream batch concat, exactly as the batch
    * operator's final groupBy. */
  def segmentBloomDedup(docs: DataFrame, idCol: String, textCol: String,
                        segWords: Int, nShards: Int = 64,
                        mBits: Int = 1 << 16,
                        kHashes: Int = 5): Dataset[SegRow] = {
    require(Integer.bitCount(nShards) == 1, "nShards must be a power of two")
    require(mBits % 8 == 0, "mBits must be byte-aligned")
    val spark = docs.sparkSession
    import spark.implicits._
    val segs = graft.operators.Curation.chunkDocuments(
        docs, idCol, col(textCol), segWords, 0)
      .select(xxhash64(col("chunk_text")).as("fp"),
        col(idCol).cast("long").as("doc_id"),
        col("chunk_ix").cast("long").as("chunk_ix"),
        col("chunk_text")).as[SegRow]
    segs.groupByKey(r => (r.fp & (nShards - 1)).toInt)
      .flatMapGroupsWithState[BloomShard, SegRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[SegRow], state: GroupState[BloomShard]) =>
          bloomSieve(it.toIndexedSeq.sortBy(r => (r.doc_id, r.chunk_ix)),
            state, mBits, kHashes)(_.fp)
      }
  }

  /** Input projection for transition extraction. */
  case class TEv(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                 event_type: String)

  /** Per-user frontier kept in the state store. */
  case class LastEv(us: Long, eventId: Long, tpe: String)

  /** Emitted transition (event-timed, so downstream windowed aggregation
    * can consume it). */
  case class Transition(user_id: Long, from_type: String, to_type: String,
                        ts: java.sql.Timestamp)

  /** Streaming twin of the batch transition matrix (OpsEvents
    * events_transitions): per-user (previous event → this event) pairs via
    * one frontier record of state per user. Within a micro-batch events
    * sort by (event time, event_id); an event arriving BEHIND the stored
    * frontier (late beyond the last emitted transition) is dropped rather
    * than spliced — transitions already emitted are immutable in append
    * mode, so re-ordering history would double-count. In-order replay
    * therefore reproduces the batch lead() pair set exactly. State is one
    * fixed-size record per user (no growth with event volume). */
  def transitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).as[TEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[TEv], state: GroupState[LastEv]) =>
          val evs = it.toIndexedSeq.sortBy(e => (usOf(e.ts), e.event_id))
          var last = state.getOption
          val out = scala.collection.mutable.ListBuffer.empty[Transition]
          evs.foreach { e =>
            val t = usOf(e.ts)
            last match {
              case Some(l) if t < l.us ||
                  (t == l.us && e.event_id <= l.eventId) =>
                () // behind the frontier: dropped (see scaladoc)
              case Some(l) =>
                out += Transition(user, l.tpe, e.event_type, e.ts)
                last = Some(LastEv(t, e.event_id, e.event_type))
              case None =>
                last = Some(LastEv(t, e.event_id, e.event_type))
            }
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming incremental distinct counting on mergeable HLL sketch
    * state — the continuous form of the batch `llm_distinct_sketch`
    * contract (yesterday's sketches merge with today's without
    * rescanning): per group the state store holds ONE fixed-size HLL
    * buffer forever, no watermark needed, and register-wise max merging
    * is order-independent so the streaming estimate equals the batch
    * sketch over the same rows at every micro-batch boundary
    * (StreamingSpec asserts exact equality). Complete-mode output: each
    * trigger emits the current per-group estimate. */
  def distinctSketch(rows: DataFrame, groupCol: String,
                     valueCol: String): DataFrame =
    rows.groupBy(col(groupCol))
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg($valueCol))")
        .as("distinct_est"))
}
