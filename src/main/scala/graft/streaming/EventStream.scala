package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types.DecimalType

import graft.sources.JdbcUpsert

/** Structured Streaming extension (SURVEY.md §1.3 notes the reference is
  * batch-only; this is the streaming path a large-scale pipeline needs):
  * the `events` table replayed as a stream with watermarked windowed
  * aggregation, plus stateful sessionization via flatMapGroupsWithState.
  *
  * `events.ts` arrives as epoch-nanos LongType (see graft.Sessions); it is
  * converted to a proper timestamp for event-time semantics.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionState(start: Long, last: Long, n: Int, total: Double)

  final case class Session(user_id: Long, session_start: Long,
      session_end: Long, n_events: Int, total_value: Double)

  /** Hourly windowed counts with a 2-hour watermark — the streaming twin of
    * the batch q19_time_window query (results must agree when the stream is
    * fully replayed).
    */
  /** `eventsDir` must be a DIRECTORY of parquet files (the file-stream
    * source tails directories, not single files).
    */
  def hourlyCounts(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    // same read-boundary ts normalization as the batch loader
    // (graft.Tables.withNanosTs): the corpus may carry ts as nanos LONG or
    // as TIMESTAMP(MICROS); everything downstream assumes nanos long
    graft.Tables.withNanosTs(
      spark.readStream
        .schema(schema)
        .parquet(eventsDir))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as("bucket_start"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming twin of the q112 hourly distinct-user sketch: the HLL
    * aggregate under a watermarked hourly window. This is the query the
    * exact `countDistinct` CANNOT express in a stream (per-window
    * distinct state is unbounded); the sketch's state is the 4 KB
    * register array per open window, merged across micro-batches by
    * register max and evicted at the watermark. The emitted sketch
    * bytes are BIT-EQUAL to the batch build over the same data —
    * max-merge is arrival-order invariant — which the spec pins.
    */
  def hourlyDistinct(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    graft.Tables.withNanosTs(
      spark.readStream.schema(schema).parquet(eventsDir))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(graft.functions.Hll.hllSketch(col("user_id")).as("sk"))
      .select(
        unix_timestamp(col("window.start")).as("bucket_start"),
        col("event_type"),
        graft.functions.Hll.hllEst(col("sk")).as("est_users"),
        col("sk"))
  }

  /** Streaming twin of the q118 count-min build at window grain: per
    * (hour, event_type), the CM sketch of user activity under the same
    * 2-hour watermark. The exact formulation — `groupBy(window, type,
    * user)` — keys state on the USER dimension and grows without bound;
    * the sketch holds one fixed depth×width grid per open window,
    * merged across micro-batches by counter addition and evicted at the
    * watermark. Addition commutes, so the emitted bytes are BIT-EQUAL
    * to the batch build on replay whatever the arrival order — the spec
    * pins that, plus the no-undercount guarantee against exact batch
    * counts ([[graft.functions.CmOps]]). Any key's hourly frequency is
    * then `cm_query(sk, hash)` at read time — items never stored.
    */
  def hourlyFreqSketch(spark: SparkSession, eventsDir: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    graft.Tables.withNanosTs(
      spark.readStream.schema(schema).parquet(eventsDir))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(graft.functions.CountMin.cmSketch(
        graft.functions.PortableHash60.portableHash60(
          col("user_id").cast("string")), depth, width).as("sk"))
      .select(
        unix_timestamp(col("window.start")).as("bucket_start"),
        col("event_type"), col("sk"))
  }

  /** Session gap in nanoseconds (30 minutes). */
  val SessionGapNs: Long = 30L * 60 * 1000000000L

  /** Stateful sessionization: per-user event stream folded into sessions
    * closed after a 30-minute gap. KeyValueGroupedDataset +
    * flatMapGroupsWithState is THE custom-state primitive
    * (mapPartitions-style logic without giving up incremental execution).
    */
  def sessionize(spark: SparkSession, events: Dataset[Event]): Dataset[Session] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionFold)
  }

  private[streaming] def sessionFold(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (e.ts, e.event_id))
    var cur = state.getOption
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts - s.last <= SessionGapNs =>
          cur = Some(SessionState(s.start, e.ts, s.n + 1, s.total + e.value))
        case Some(s) =>
          closed += Session(userId, s.start, s.last, s.n, s.total)
          cur = Some(SessionState(e.ts, e.ts, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts, e.ts, 1, e.value))
      }
    }
    cur match {
      case Some(s) => state.update(s)
      case None    => ()
    }
    closed.iterator
  }

  /** Streaming serve path: land a streaming aggregate in the JDBC serving
    * layer through the SAME transactional upsert the batch pipeline uses
    * (`writeStream.foreachBatch` → [[JdbcUpsert.upsert]]). In `update`
    * output mode each micro-batch carries only the groups that changed;
    * because the upsert is keyed delete+insert, a replayed micro-batch
    * (restart/retry) overwrites itself — end-to-end idempotent per key,
    * which is the reference pipeline's CopyGames-style load guarantee
    * carried over to streaming.
    */
  def toJdbc(
      aggregated: DataFrame,
      url: String,
      table: String,
      idCols: Seq[String],
      checkpoint: String): StreamingQuery =
    aggregated.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        JdbcUpsert.upsert(batch, url, table, idCols)
      }
      .start()

  /** Streaming exact-dedup twin of the batch q25 fingerprint dedup: the
    * documents corpus replayed as a stream, deduplicated on the normalized
    * content fingerprint. First arrival per fingerprint survives — which
    * doc_id that is depends on arrival order, so the engine-independent
    * facts (spec-asserted against the batch) are the surviving fingerprint
    * SET and its size.
    *
    * Scale notes: dedup state is one entry per distinct fingerprint; an
    * unbounded stream bounds it with a watermark on an ingest-time column
    * (`dropDuplicatesWithinWatermark`) — exact forever-dedup at 100 TB
    * instead keeps the fingerprint set in the serving store (the
    * `position_evals` anti-join pattern, J7).
    */
  def dedupStream(spark: SparkSession, docsDir: String): DataFrame = {
    val schema = spark.read.parquet(docsDir).schema
    spark.readStream
      .schema(schema)
      .parquet(docsDir)
      .select(col("doc_id"),
        graft.operators.TextOps.fingerprintExpr(col("text")).as("fp"))
      .dropDuplicates("fp")
  }

  /** Bounded-state streaming dedup: `dropDuplicatesWithinWatermark` keeps
    * per-fingerprint state only until the watermark passes it, so an
    * unbounded stream runs with bounded memory — the trade being that a
    * duplicate arriving after its original's state expired is emitted
    * again (the spec pins exactly that re-emission). Forever-exact dedup
    * at 100 TB instead anti-joins against the at-rest fingerprint store
    * (the J7 pattern) — see [[dedupStream]]'s scale note.
    */
  def dedupStreamBounded(docs: DataFrame, watermark: String): DataFrame =
    docs
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming passage-level dedup — the online twin of the batch q72:
    * incoming documents are cut into 16-token passages with the SAME
    * in-row explode the batch operator uses ([[graft.operators.Dedup
    * .passages]]), and the first arrival of each passage fingerprint
    * survives. As with [[dedupStream]], which (doc_id, pidx) claims a
    * fingerprint depends on arrival order, so the engine-independent
    * facts (spec-asserted against batch q72) are the surviving
    * fingerprint SET and its size; the per-document text REBUILD is a
    * second stateful aggregation and stays batch-side — the same
    * stream/batch split as [[neardupGate]]'s per-doc ANY.
    *
    * Scale notes: state is one entry per distinct passage fingerprint
    * (~tokens/16 entries per novel document); an unbounded deployment
    * bounds it exactly as [[dedupStreamBounded]] documents for
    * whole-document fingerprints — watermark-scoped state, or the J7
    * anti-join against the at-rest fingerprint store.
    */
  def passageDedupStream(spark: SparkSession, docsDir: String): DataFrame = {
    val schema = spark.read.parquet(docsDir).schema
    graft.operators.Dedup.passages(
      spark.readStream.schema(schema).parquet(docsDir))
      .dropDuplicates("fp")
  }

  final case class BandMembership(doc_id: Long, band: Int, r0: Long, r1: Long)

  final case class BucketClaim(first_doc: Long)

  final case class BucketHit(doc_id: Long, band: Int, first_doc: Long)

  /** Streaming incremental passage gate — the online twin of the batch
    * q76, and the catalog's STREAM-STATIC JOIN surface: incoming
    * documents explode to passages in-row, LEFT-join the at-rest
    * fingerprint index ([[graft.operators.Dedup.buildPassageIndex]]'s
    * parquet artifact), and per-document verdicts aggregate in update
    * mode. Spark re-plans the static side per micro-batch, so a
    * nightly-refreshed index file is picked up without restarting the
    * query — exactly the daily-increment deployment the batch gate
    * documents.
    *
    * Scale notes: the static side joins however the planner prefers
    * (broadcast under the threshold, shuffle-hash otherwise — same
    * plan space as batch); aggregation state is one triple per
    * in-flight document, and a production run bounds it with
    * [[passageGateStreamWatermarked]] (documents arrive whole, so
    * state is droppable one watermark after arrival).
    */
  def passageGateStream(spark: SparkSession, docsDir: String,
      index: DataFrame): DataFrame = {
    val schema = spark.read.parquet(docsDir).schema
    // the hit semantics and admission threshold live in ONE place —
    // the un-ordered core shared with the batch q76
    graft.operators.Dedup.gatePassagesCore(index,
      spark.readStream.schema(schema).parquet(docsDir))
  }

  /** [[passageGateStream]] with BOUNDED state — the deployment shape: the
    * document stream carries an `ingest_time` event-time column, the
    * watermark rides it, and `ingest_time` joins the aggregation key, so
    * each document's verdict state is evicted one `lateness` after its
    * arrival instead of living forever (the [[funnelStreamWatermarked]]
    * treatment applied to the gate). Verdict semantics are unchanged —
    * the same [[graft.operators.Dedup.gatePassagesCore]] as batch q76;
    * documents arrive whole, so all of a document's passages share one
    * ingest_time and the extra grouping key never splits a verdict.
    * With the watermark in place the query also runs in APPEND mode:
    * each verdict emits exactly once, final, when the watermark passes
    * its ingest_time.
    */
  def passageGateStreamWatermarked(docs: DataFrame, index: DataFrame,
      lateness: String): DataFrame =
    graft.operators.Dedup.gatePassagesCore(index,
      docs.withWatermark("ingest_time", lateness),
      carry = Seq("ingest_time"))

  /** Streaming twin of the batch q122 keyed interval join — and the
    * CANONICAL stream-stream time-range join: because the user_id
    * equality is part of the predicate, Structured Streaming accepts the
    * event-time range directly (state shuffles on user_id; no epoch
    * quantization needed, unlike [[bandJoinStream]] where the band is
    * keyless). The two watermarks plus the 30-minute range bound the
    * buffered state: a view is droppable once the click-side watermark
    * passes v_time + 30min, a click once the view-side watermark passes
    * c_time. Emits matched (click, view) PAIRS append-mode; the
    * per-click count/latest aggregation is the foreachBatch half (the
    * [[bandJoinStream]] split), where zero-view clicks left-join back in.
    */
  def attributionStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    def side(tp: String): DataFrame = {
      val reader = spark.readStream.schema(schema)
      maxFilesPerTrigger.foreach(n =>
        reader.option("maxFilesPerTrigger", n.toString))
      graft.Tables.withNanosTs(reader.parquet(eventsDir))
        .filter(col("event_type") === tp)
    }
    val clicks = side("click")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("c_us"),
        timestamp_micros(expr("ts div 1000")).as("c_time"))
      .withWatermark("c_time", "10 minutes")
    val views = side("view")
      .select(col("user_id").as("v_user"), expr("ts div 1000").as("v_us"),
        timestamp_micros(expr("ts div 1000")).as("v_time"))
      .withWatermark("v_time", "10 minutes")
    clicks.join(views,
      expr("user_id = v_user AND " +
        "v_time >= c_time - interval 30 minutes AND v_time < c_time"))
      .select(col("event_id"), col("user_id"), col("c_us"), col("v_us"))
  }

  /** Streaming twin of the batch q81 keyless time-band join. Structured
    * Streaming's stream-stream join REFUSES a pure range condition — an
    * equality predicate is mandatory because join state must shuffle on
    * some key — so the batch operator's epoch quantization transfers
    * verbatim: clicks key on their δ-width epoch, purchases explode to
    * their own and both adjacent epochs, the join equates epochs and the
    * `[p_time − δ, p_time + δ]` range rides on top. The same
    * exactly-one-epoch-combination argument as batch means no dedup pass.
    * The event-time range plus the two watermarks is what BOUNDS the join
    * state: each buffered row is dropped as soon as the other side's
    * watermark passes its band edge — the streaming counterpart of the
    * batch plan's "matches are data-bounded, never |L|×|R|".
    *
    * Emits matched PAIRS (purchase event_id, both µs timestamps, click
    * value), append-mode; the per-purchase count/sum aggregation is a
    * second stateful operator, so it stays batch-side (foreachBatch — the
    * same stream/batch split as [[neardupGate]]'s per-doc ANY), and
    * zero-match purchases are a left-join there too. The band edges are
    * inclusive on both sides, matching the batch operator's |Δt| ≤ δ.
    */
  def bandJoinStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    val bandUs = graft.operators.ScaleOps.BandUs
    def side(tp: String): DataFrame = {
      val reader = spark.readStream.schema(schema)
      maxFilesPerTrigger.foreach(n =>
        reader.option("maxFilesPerTrigger", n.toString))
      graft.Tables.withNanosTs(reader.parquet(eventsDir))
        .filter(col("event_type") === tp)
    }
    val purchases = side("purchase")
      .select(col("event_id"), expr("ts div 1000").as("p_us"),
        timestamp_micros(expr("ts div 1000")).as("p_time"))
      .withWatermark("p_time", "10 minutes")
      .withColumn("e0", expr(s"p_us div $bandUs"))
      .withColumn("epoch", explode(array(col("e0") - 1, col("e0"), col("e0") + 1)))
    val clicks = side("click")
      .select(expr("ts div 1000").as("c_us"), col("value"),
        timestamp_micros(expr("ts div 1000")).as("c_time"))
      .withWatermark("c_time", "10 minutes")
      .withColumn("c_epoch", expr(s"c_us div $bandUs"))
    purchases.join(clicks,
      expr("epoch = c_epoch AND " +
        "c_time >= p_time - interval 5 minutes AND " +
        "c_time <= p_time + interval 5 minutes"))
      .select(col("event_id"), col("p_us"), col("c_us"), col("value"))
  }

  /** Streaming NEAR-dup gate — the online counterpart of the batch
    * q28/q48 MinHash-LSH family: an incoming document is a near-dup
    * CANDIDATE when any of its LSH band buckets was already claimed by an
    * earlier document. State is ONE long per occupied bucket (the first
    * claimant's doc_id), keyed by the band triple via
    * flatMapGroupsWithState; the signature and band rows are in-row native
    * expressions (streaming-safe, no shuffle before the state operator's
    * own keyed exchange).
    *
    * Semantics are stream-ordered by design: the first arrival claims the
    * bucket (ties within a micro-batch break by min doc_id, so a replay of
    * the same batches is deterministic); on full replay the candidate SET
    * matches the batch pair graph — a doc is flagged iff it shares a
    * bucket with a doc that arrived before it. Output is one row per band
    * membership (doc_id, band, first_doc); a doc is a candidate iff any of
    * its rows has first_doc != doc_id — that per-doc ANY is a second
    * stateful aggregation, so it runs batch-side (foreachBatch /
    * [[neardupFlags]]), the same split [[toJdbc]] uses.
    *
    * Scale notes: state size is |occupied buckets| longs, not |docs|; an
    * unbounded deployment bounds it with state TTL (GroupStateTimeout) or
    * keeps claims in the at-rest store via the J7 anti-join pattern —
    * exactly the [[dedupStreamBounded]] trade documented for exact dedup.
    */
  def neardupGate(docs: DataFrame): Dataset[BucketHit] = {
    import docs.sparkSession.implicits._
    graft.operators.Dedup.bandRowsFromSigs(
      graft.operators.Dedup.sigRows(docs))
      .as[BandMembership]
      .groupByKey(m => (m.band, m.r0, m.r1))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        bucketFold)
  }

  private[streaming] def bucketFold(
      key: (Int, Long, Long),
      rows: Iterator[BandMembership],
      state: GroupState[BucketClaim]): Iterator[BucketHit] = {
    val sorted = rows.toSeq.sortBy(_.doc_id)
    val claimant = state.getOption.map(_.first_doc)
      .getOrElse(sorted.head.doc_id)
    if (state.getOption.isEmpty) state.update(BucketClaim(claimant))
    sorted.iterator.map(m => BucketHit(m.doc_id, m.band, claimant))
  }

  /** Batch-side reduction of [[neardupGate]] output: per-doc candidate
    * flag (any bucket already claimed by another doc).
    */
  def neardupFlags(hits: DataFrame): DataFrame =
    hits.groupBy(col("doc_id"))
      .agg(max(col("first_doc") =!= col("doc_id")).as("is_candidate"))

  final case class FunnelState(view: Long, click: Long, purchase: Long)

  final case class FunnelRow(user_id: Long, view_us: Option[Long],
      click_us: Option[Long], purchase_us: Option[Long], stage: Int,
      late_dropped: Int)

  /** Streaming funnel — the stateful twin of the batch q57: per user,
    * first view → first click within an hour of it → first purchase
    * within an hour of that, folded incrementally with
    * flatMapGroupsWithState (state = three longs per user, monotone:
    * a stage timestamp never changes once set). Each touched user emits
    * its current funnel row per micro-batch; [[funnelFinal]] is the
    * batch-side reduction to the latest row (stage only grows — the
    * [[neardupFlags]] split).
    *
    * Semantics are exact vs the batch operator ONLY when each user's
    * events arrive in event-time order across micro-batches (within a
    * batch the fold sorts). When the ingest cannot guarantee that,
    * use [[funnelStreamWatermarked]], which buffers out-of-order
    * arrivals in state and folds them in event-time order once the
    * watermark passes — exact vs q57 for any arrival order within the
    * lateness bound. This raw variant detects contract violations
    * instead of silently diverging: an event arriving at or before the
    * user's already-folded event-time high-water mark is counted in
    * `late_dropped` (monotone per user), never folded.
    */
  final case class HourlyCount(event_type: String, hour: Long, x: Long)
  final case class CusumRow(event_type: String, hour: Long, x: Long,
      cusum: Double, alarm: Boolean)
  /** CUSUM running state: the drift prefix and its running min — the
    * SAME two quantities the batch q131 window factorization carries,
    * here as two longs per event type.
    */
  final case class CusumState(pre: Long, runmin: Long)
  final case class HourlyWithRef(event_type: String, hour: Long,
      x: Long, n_ref: Long, sx: Long, h_micro: Long)

  /** Streaming twin of the batch q131 CUSUM monitor: live hourly counts
    * checked against a PERSISTED reference block
    * ([[graft.operators.ScaleOps.cusumReference]] → parquet), the
    * passage-gate pattern applied to the drift family — history is never
    * recomputed, and a nightly reference refresh needs no restart
    * (stream-static join re-plans per micro-batch). State per event type
    * is exactly the batch factorization's two running quantities (drift
    * prefix + running min), folded in hour order within each batch;
    * arrival contract across batches is [[funnelStream]]'s.
    */
  def cusumStream(hourly: Dataset[HourlyCount], ref: DataFrame): Dataset[CusumRow] = {
    import hourly.sparkSession.implicits._
    hourly.join(broadcast(ref), Seq("event_type"))
      .select($"event_type", $"hour", $"x", $"n_ref", $"sx", $"h_micro")
      .as[HourlyWithRef]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        cusumFold)
  }

  private[streaming] def cusumFold(
      eventType: String, rows: Iterator[HourlyWithRef],
      state: GroupState[CusumState]): Iterator[CusumRow] = {
    var s = state.getOption.getOrElse(CusumState(0L, 0L))
    val out = rows.toSeq.sortBy(_.hour).map { r =>
      val pre = s.pre + (r.n_ref * r.x - r.sx)
      val runmin = math.min(s.runmin, math.min(pre, 0L))
      s = CusumState(pre, runmin)
      val sMicro = math.round((pre - runmin).toDouble * 1e6 / r.n_ref)
      CusumRow(eventType, r.hour, r.x, sMicro / 1e6, sMicro > r.h_micro)
    }
    state.update(s)
    out.iterator
  }

  /** Streaming twin of the q133 seasonal anomaly gate — completely
    * STATELESS: live hourly counts join the persisted 24-bin profile
    * ([[graft.operators.ScaleOps.seasonalProfile]] → parquet) and the
    * leave-one-out residual test runs in-row per arriving hour. The
    * stream-static join re-plans per micro-batch, so a nightly profile
    * refresh needs no restart; with no per-key state there is nothing
    * to bound — the lightest deployment shape in the monitoring family
    * (CUSUM carries two longs per type; this carries nothing).
    * Emits the same (expected, residual, is_anomaly) columns as batch
    * q133, computed by the identical expressions.
    */
  def seasonalGateStream(hourly: Dataset[HourlyCount], profile: DataFrame): DataFrame = {
    import hourly.sparkSession.implicits._
    hourly
      .withColumn("hod", pmod($"hour", lit(24L)))
      .join(broadcast(profile), Seq("event_type", "hod"))
      .withColumn("d", $"n" * $"x" - $"sx")
      .select($"event_type", $"hour", $"hod", $"x",
        (round($"sx".cast("double") * 1e6 / $"n").cast("long")
          .cast("double") / 1e6).as("expected"),
        (round($"d".cast("double") * 1e6 / $"n").cast("long")
          .cast("double") / 1e6).as("residual"),
        ($"n" >= 3 && $"d".cast("double") * $"d" * ($"n" - 2) >
          lit(9.0) * ($"n" - 1).cast("double") *
            (($"n" - 1) * ($"sxx" - $"x" * $"x") -
              ($"sx" - $"x") * ($"sx" - $"x")).cast("double"))
          .as("is_anomaly"))
  }

  final case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Per-user last-event state for [[transitionsStream]]: ONE triple. */
  final case class LastEvent(ts: Long, event_id: Long, event_type: String)

  /** Streaming twin of the batch q129 Markov transition matrix: each
    * user's LAST event is the whole state (one (ts, event_id, type)
    * triple), and every arriving event emits its (from, to) transition
    * pair — the downstream count/probability matrix is an ordinary
    * streaming groupBy over |types|² keys. Within a micro-batch rows are
    * folded in (ts, event_id) event-time order; across batches the
    * arrival contract is [[funnelStream]]'s (event-time-ordered
    * batches — `funnelStreamWatermarked` shows the buffered-sort upgrade
    * path for scrambled arrivals). An unbounded deployment bounds the
    * per-user state with GroupStateTimeout, exactly as documented on
    * [[neardupGate]].
    */
  def transitionsStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        transitionsFold)
  }

  private[streaming] def transitionsFold(
      userId: Long, rows: Iterator[Event],
      state: GroupState[LastEvent]): Iterator[Transition] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
    var last = state.getOption
    val out = Seq.newBuilder[Transition]
    sorted.foreach { e =>
      last.foreach(l => out += Transition(userId, l.event_type, e.event_type))
      last = Some(LastEvent(e.ts, e.event_id, e.event_type))
    }
    last.foreach(state.update)
    out.result().iterator
  }

  def funnelStream(events: Dataset[Event]): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        funnelFold)
  }

  private val FunnelWindowUs = 3600L * 1000000L

  /** One funnel step: fold event `(us, type)` into monotone state `s`. */
  private def funnelStep(s: FunnelState, us: Long, eventType: String): FunnelState =
    eventType match {
      case "view" if s.view < 0 => s.copy(view = us)
      case "click" if s.view >= 0 && s.click < 0 &&
        us > s.view && us <= s.view + FunnelWindowUs => s.copy(click = us)
      case "purchase" if s.click >= 0 && s.purchase < 0 &&
        us > s.click && us <= s.click + FunnelWindowUs => s.copy(purchase = us)
      case _ => s
    }

  private def funnelRow(userId: Long, s: FunnelState, late: Int): Iterator[FunnelRow] =
    if (s.view < 0 && late == 0) Iterator.empty
    else Iterator.single(FunnelRow(userId,
      if (s.view >= 0) Some(s.view) else None,
      if (s.click >= 0) Some(s.click) else None,
      if (s.purchase >= 0) Some(s.purchase) else None,
      (if (s.view >= 0) 1 else 0) + (if (s.click >= 0) 1 else 0) +
        (if (s.purchase >= 0) 1 else 0),
      late))

  /** Raw-fold state: funnel plus the event-time high-water mark already
    * folded (us) and the count of contract-violating late arrivals.
    */
  final case class FunnelRawState(f: FunnelState, folded_max_us: Long,
      late_dropped: Int)

  private[streaming] def funnelFold(
      userId: Long,
      rows: Iterator[Event],
      state: GroupState[FunnelRawState]): Iterator[FunnelRow] = {
    var b = state.getOption.getOrElse(
      FunnelRawState(FunnelState(-1L, -1L, -1L), Long.MinValue, 0))
    rows.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
      val us = e.ts / 1000L
      if (us < b.folded_max_us)
        // arrived after a later event was already folded: the ordered-
        // ingest contract is broken for this user — count, don't fold
        b = b.copy(late_dropped = b.late_dropped + 1)
      else
        b = FunnelRawState(funnelStep(b.f, us, e.event_type),
          math.max(b.folded_max_us, us), b.late_dropped)
    }
    state.update(b)
    funnelRow(userId, b.f, b.late_dropped)
  }

  /** Event with the extracted event-time column the watermark rides on. */
  final case class TimedEvent(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double, props: String,
      event_time: java.sql.Timestamp)

  /** A buffered not-yet-foldable arrival (event-time still above the
    * watermark): the minimal fields the fold needs.
    */
  final case class PendingEvent(ts: Long, event_id: Long, event_type: String)

  /** Watermarked-fold state: funnel + pending buffer + folded high-water
    * mark (us) + beyond-bound late count.
    */
  final case class FunnelWmState(f: FunnelState, pending: Seq[PendingEvent],
      folded_max_us: Long, late_dropped: Int)

  /** Order-correct streaming funnel: the watermark + sort ingest contract
    * IMPLEMENTED rather than assumed. Arrivals are buffered in state until
    * the event-time watermark passes them, then folded in (ts, event_id)
    * order — so the result equals the batch q57 for ANY arrival order
    * within the `lateness` bound (the spec replays deliberately scrambled
    * micro-batches and pins equality). An event older than the user's
    * folded high-water mark that still reaches the operator (beyond-bound
    * straggler not already filtered by the watermark) is counted in
    * `late_dropped`, never folded — divergence is visible, not silent.
    *
    * Scale notes: state is the funnel triple plus only the events inside
    * the lateness window (bounded by lateness × per-user arrival rate);
    * EventTimeTimeout re-invokes idle users exactly when the watermark
    * reaches their oldest pending event, so buffers drain without new
    * per-user traffic.
    */
  def funnelStreamWatermarked(
      events: Dataset[Event], lateness: String): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .as[TimedEvent]
      .withWatermark("event_time", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        funnelFoldWatermarked)
  }

  private[streaming] def funnelFoldWatermarked(
      userId: Long,
      rows: Iterator[TimedEvent],
      state: GroupState[FunnelWmState]): Iterator[FunnelRow] = {
    var b = state.getOption.getOrElse(
      FunnelWmState(FunnelState(-1L, -1L, -1L), Vector.empty, Long.MinValue, 0))
    val incoming = rows.map(e => PendingEvent(e.ts, e.event_id, e.event_type)).toVector
    // a straggler below the folded high-water mark can no longer be folded
    // in order: count it as dropped (usually the watermark filters these
    // before they reach the operator; this is the defense-in-depth count)
    val (lost, fresh) = incoming.partition(_.ts / 1000L < b.folded_max_us)
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, wait) = (b.pending ++ fresh).partition(_.ts / 1000L <= wmUs)
    var f = b.f
    var foldedMax = b.folded_max_us
    ready.sortBy(e => (e.ts, e.event_id)).foreach { e =>
      f = funnelStep(f, e.ts / 1000L, e.event_type)
      foldedMax = math.max(foldedMax, e.ts / 1000L)
    }
    b = FunnelWmState(f, wait, foldedMax, b.late_dropped + lost.size)
    state.update(b)
    if (wait.nonEmpty)
      // wake this user when the watermark reaches its oldest pending event
      state.setTimeoutTimestamp(
        math.max(wait.map(_.ts / 1000000L).min, state.getCurrentWatermarkMs() + 1L))
    // emit only when the visible row could have CHANGED — something
    // folded (ready) or the late count moved (lost). This covers both
    // no-op invocations: a stale timeout firing after the buffer drained
    // via normal arrivals (the GroupState API has no clearTimeout), and
    // a micro-batch whose arrivals ALL buffered above the watermark.
    if (lost.isEmpty && ready.isEmpty) Iterator.empty
    else funnelRow(userId, f, b.late_dropped)
  }

  /** Batch-side reduction of [[funnelStream]] /
    * [[funnelStreamWatermarked]] output: the latest funnel row per user
    * (stage, the set timestamps, and the late count only ever grow).
    */
  def funnelFinal(rows: DataFrame): DataFrame =
    rows.groupBy(col("user_id"))
      .agg(max(struct(col("stage"), col("view_us"), col("click_us"),
        col("purchase_us"))).as("s"),
        max(col("late_dropped")).as("late_dropped"))
      .select(col("user_id"), col("s.view_us"), col("s.click_us"),
        col("s.purchase_us"), col("s.stage"), col("late_dropped"))

  /** Streaming quality gate — the STATELESS screen an ingest stream runs
    * before any stateful operator (dedup, sessionization): the q22
    * composite quality score, the q59 top-2-gram repetition fraction, and
    * the q51 PII counts, in ONE in-row projection over the document
    * stream. No state, no watermark, no shuffle — appends flow through at
    * wire speed on any number of executors. The quality and repetition
    * legs reuse the batch operators' own column expressions, so those
    * verdicts are EQUAL to q22/q59 by construction (the spec replays
    * both); the PII leg shares q51's regex constants but counts over the
    * RAW text (q51 counts over its planted test line), so the spec pins
    * its semantics by streaming planted-PII rows instead. `keep` is the
    * ingest policy: quality ≥ 0.5, repetition below half, no PII hits.
    *
    * Degenerate docs (< 2 tokens, so no 2-grams): `top_2gram_frac` is
    * NULL — q59 has no repetition signal for them, and pretending 0.0
    * would wave them through the repetition leg. The keep policy treats
    * the NULL explicitly as reject (`coalesce(frac < 0.5, false)`): a
    * one-token document is never training-corpus material.
    */
  def qualityGate(docs: DataFrame): DataFrame = {
    val rs = graft.functions.ShingleFunctions.repetitionStats(split(col("text"), " "))
    docs.select(col("doc_id"),
      graft.operators.TextOps.qualityScoreExpr(col("text"), col("n_chars"))
        .as("quality_score"),
      round(rs(2).cast("double") / rs(0), 6).as("top_2gram_frac"),
      size(regexp_extract_all(col("text"),
        lit(graft.operators.TrainPrep.emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"),
        lit(graft.operators.TrainPrep.phoneRe), lit(0))).as("n_phones"))
      .withColumn("keep",
        col("quality_score") >= 0.5 &&
          coalesce(col("top_2gram_frac") < 0.5, lit(false)) &&
          col("n_emails") === 0 && col("n_phones") === 0)
  }

  /** Streaming Bloom decontamination gate — the stateless scan-side screen
    * at ingest: each arriving document is shingled in-row and probed
    * against the STATIC broadcast Bloom bitset
    * ([[graft.operators.TrainPrep.bloomBuild]]'s single-row frame, built
    * batch-side from the benchmark suite). Like [[passageGateStream]],
    * the static side is re-planned per micro-batch, so a refreshed
    * benchmark bitset is picked up without restarting the query — and
    * unlike the passage gate there is NO state at all: the bitset rides
    * in as a broadcast row, verdicts are per-row projections, appends
    * flow through at wire speed. The keep/drop semantics are
    * [[graft.operators.TrainPrep.bloomGate]]'s own (shared core, one
    * tau), so streaming == batch by construction; the spec replays both.
    */
  def bloomGateStream(docs: DataFrame, bits: DataFrame, tau: Double): DataFrame =
    graft.operators.TrainPrep.bloomGate(docs, bits, tau)

  /** Streaming document chunker — [[graft.operators.TrainPrep]]'s q88
    * sliding-window chunking applied at ingest: stateless and entirely
    * in-row (sequence-explode + array slice), so it composes freely
    * before any stateful stage and appends flow through unbounded. The
    * column pipeline is shared verbatim with the batch operator minus its
    * presentation sort (streams cannot globally sort; a downstream sink
    * partitions by doc_id instead), so streaming == batch on replay by
    * construction — the spec replays both.
    */
  def chunkStream(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.operators.TrainPrep.chunkCore(
      docs.select($"doc_id", $"lang", split($"text", " ").as("toks")))
  }

  /** Streaming incremental chunk gate — [[passageGateStream]]'s shape at
    * chunk grain: arriving documents chunk in-row, LEFT-join the at-rest
    * chunk-fingerprint index
    * ([[graft.operators.TrainPrep.buildChunkIndex]]'s parquet artifact,
    * re-planned per micro-batch so a nightly refresh needs no restart),
    * and per-document verdicts aggregate in update mode. Hit semantics
    * and threshold live in the core shared verbatim with the batch q92.
    */
  def chunkGateStream(docs: DataFrame, index: DataFrame): DataFrame =
    graft.operators.TrainPrep.gateChunksCore(index, docs)

  /** Batch-mode sessionization with identical semantics (window-based),
    * used to cross-check the stateful operator and as the at-rest variant.
    */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > SessionGapNs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("total_value"))
      .drop("session_id")
  }
}
