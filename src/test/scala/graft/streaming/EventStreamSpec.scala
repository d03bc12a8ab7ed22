package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Streaming semantics: the windowed streaming aggregate must agree with
  * its batch twin on full replay, and stateful sessionization must agree
  * with the batch window formulation.
  */
class EventStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  locally { spark.sparkContext.setLogLevel("ERROR") }

  val sfDir = "/root/testdata/sf0.001"

  test("streaming hourly counts equal the batch q19 on full replay") {
    // the file-stream source needs a directory: stage the single parquet
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_events"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.hourlyCounts(spark, dir.toString)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT bucket_start, event_type, n, total_value FROM hourly")
        .orderBy("bucket_start", "event_type").collect()
      val batch = Relational.q19TimeWindow(spark, sfDir).collect()
      assert(streamed.length == batch.length)
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.getLong(0) == b.getLong(0))
        assert(s.getString(1) == b.getString(1))
        assert(s.getLong(2) == b.getLong(2))
        assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9)
      }
    } finally q.stop()
  }

  test("streaming hourly HLL distinct == batch sketch bytes and q112 counts on replay") {
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_hll"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.hourlyDistinct(spark, dir.toString)
      .writeStream.outputMode("complete").format("memory")
      .queryName("hourly_hll").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT bucket_start, event_type, est_users, sk FROM hourly_hll")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getAs[Array[Byte]](3).toSeq))).toMap
      // batch twin over the same corpus: identical keys, identical BYTES
      // (max-merge is arrival-order invariant), and the estimate honors
      // the q112 contract against the exact count
      import org.apache.spark.sql.functions._
      val batch = graft.Tables.events(spark, sfDir)
        .groupBy(expr("ts div 3600000000000").as("hb"), col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_exact"),
          graft.functions.Hll.hllSketch(col("user_id")).as("sk"))
        .collect()
        .map(r => (r.getLong(0) * 3600L, r.getString(1)) ->
          ((r.getLong(2), r.getAs[Array[Byte]](3).toSeq))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, (est, bytes)) =>
        val (exact, batchBytes) = batch(k)
        assert(bytes == batchBytes, s"sketch bytes diverged at $k")
        assert(math.abs(est - exact).toDouble / math.max(exact, 1L) <= 0.05, s"est at $k")
      }
    } finally q.stop()
  }

  test("streaming hourly CM sketch == batch bytes on replay; never undercounts") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_cm"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.hourlyFreqSketch(spark, dir.toString)
      .writeStream.outputMode("complete").format("memory")
      .queryName("hourly_cm").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT bucket_start, event_type, sk FROM hourly_cm")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getAs[Array[Byte]](2).toSeq)
        .toMap
      // batch twin: identical window keys, identical BYTES (counter
      // addition is arrival-order invariant)
      val hashed = graft.Tables.events(spark, sfDir)
        .withColumn("h", graft.functions.PortableHash60
          .portableHash60(col("user_id").cast("string")))
      val batch = hashed
        .groupBy(expr("ts div 3600000000000").as("hb"), col("event_type"))
        .agg(graft.functions.CountMin.cmSketch(col("h"), 4, 1024).as("sk"))
        .collect()
        .map(r => (r.getLong(0) * 3600L, r.getString(1)) ->
          r.getAs[Array[Byte]](2).toSeq).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, bytes) =>
        assert(bytes == batch(k), s"sketch bytes diverged at $k")
      }
      // the probe side holds the CM guarantee against exact hourly counts
      val exact = hashed
        .groupBy(expr("ts div 3600000000000").as("hb"), col("event_type"), col("h"))
        .agg(count(lit(1)).as("cnt"))
        .limit(200).collect()
      exact.foreach { r =>
        val key = (r.getLong(0) * 3600L, r.getString(1))
        val est = graft.functions.CmOps.query(
          streamed(key).toArray, r.getLong(2))
        assert(est >= r.getLong(3), s"undercount at $key")
      }
    } finally q.stop()
  }

  test("streaming chunker == batch q88 on full replay (stateless in-row)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_chunk"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(dir.toString).schema
    val q = EventStream.chunkStream(
      spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.outputMode("append").format("memory")
      .queryName("chunks").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM chunks")
        .orderBy(col("doc_id"), col("chunk_id")).collect()
      val batch = graft.operators.TrainPrep.q88ChunkDocs(spark, sfDir).collect()
      assert(streamed.length == batch.length && streamed.length > 0)
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("streaming chunk gate (stream-static join) equals the batch q92 verdicts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
    val index = graft.operators.TrainPrep.buildChunkIndex(docs.filter($"doc_id" % 3 =!= 0))
    val stage = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_chunkgate"))
    docs.filter($"doc_id" % 3 === 0).coalesce(1)
      .write.mode("overwrite").parquet(stage.toString)
    val schema = spark.read.parquet(stage.toString).schema
    val q = EventStream.chunkGateStream(
      spark.readStream.schema(schema).parquet(stage.toString), index)
      .writeStream.outputMode("update").format("memory")
      .queryName("chunkgate").start()
    try {
      q.processAllAvailable()
      // update mode re-emits refined rows; the LAST row per doc is final
      val streamed = spark.sql(
        """SELECT doc_id, n_chunks, n_dup_chunks, admitted FROM (
          |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n_chunks DESC) rn
          |  FROM chunkgate) WHERE rn = 1""".stripMargin)
        .orderBy($"doc_id").collect().map(_.toSeq).toSeq
      val batch = graft.operators.TrainPrep.q92ChunkGate(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming exact dedup agrees with the batch fingerprint dedup on full replay") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_docs"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.dedupStream(spark, dir.toString)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup")
      .start()
    try {
      q.processAllAvailable()
      val streamedFps = spark.sql("SELECT fp FROM dedup")
        .collect().map(_.getString(0)).toSet
      // batch q25: one survivor per distinct fingerprint
      val batch = Dedup.q25ExactDedup(spark, sfDir).collect()
      val batchFps = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(org.apache.spark.sql.functions.md5(
          lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("fp"))
        .distinct().collect().map(_.getString(0)).toSet
      assert(streamedFps.size == batch.length)
      assert(streamedFps == batchFps)
    } finally q.stop()
  }

  test("streaming passage dedup agrees with the batch q72 keep set on full replay") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_docs_p"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val q = EventStream.passageDedupStream(spark, dir.toString)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("pdedup")
      .start()
    try {
      q.processAllAvailable()
      val streamedFps = spark.sql("SELECT fp FROM pdedup")
        .collect().map(_.getString(0)).toSet
      // batch q72 keeps exactly one passage instance per distinct fp, so
      // its survivor count is the distinct-fingerprint count — and the
      // streaming survivor SET must be that fingerprint set
      val keptTotal = Dedup.q72PassageDedup(spark, sfDir)
        .agg(org.apache.spark.sql.functions.sum("n_kept")).collect()(0).getLong(0)
      val batchFps = Dedup.passages(spark.read.parquet(s"$sfDir/documents.parquet"))
        .select("fp").distinct().collect().map(_.getString(0)).toSet
      assert(streamedFps.size.toLong == keptTotal)
      assert(streamedFps == batchFps)
    } finally q.stop()
  }

  test("streaming passage gate (stream-static join) equals the batch q76 verdicts") {
    import graft.operators.Dedup
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val batchDir = java.nio.file.Files.createTempDirectory("gate_docs").toString
    docs.filter($"doc_id" % 3 === 0).write.mode("overwrite").parquet(batchDir)
    val index = Dedup.buildPassageIndex(docs.filter($"doc_id" % 3 =!= 0))
    val q = EventStream.passageGateStream(spark, batchDir, index)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("pgate")
      .start()
    try {
      q.processAllAvailable()
      // update mode may emit a doc more than once across micro-batches;
      // the LAST update per doc carries the complete verdict
      val streamed = spark.sql(
        "SELECT doc_id, n_passages, n_dup_passages, admitted FROM pgate")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      val batch = Dedup.q76PassageGate(spark, sfDir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      assert(streamed == batch, "streaming gate diverges from batch q76")
    } finally q.stop()
  }

  test("watermarked passage gate: scrambled replay equals batch q76; state is watermark-evicted") {
    import graft.operators.Dedup
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val index = Dedup.buildPassageIndex(docs.filter($"doc_id" % 3 =!= 0))
    val batchDocs = docs.filter($"doc_id" % 3 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val base = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // ingest times spread over 4 minutes; arrival order scrambled by a
    // doc_id hash, split across three micro-batches — every arrival is
    // late by up to 4 min, inside the 10 min bound
    val timed = batchDocs.map { case (id, text) =>
      (id, text, ts(base + (id % 5) * 60000L)) }
    val scrambled = timed.sortBy { case (id, _, _) => (id * 2654435761L) % 97 }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val stream = source.toDF().toDF("doc_id", "text", "ingest_time")
    val q = EventStream.passageGateStreamWatermarked(stream, index, "10 minutes")
      .writeStream
      .outputMode("append") // final-on-emit: possible only because state closes
      .format("memory")
      .queryName("wpgate")
      .start()
    try {
      scrambled.grouped(math.max(1, scrambled.size / 3 + 1)).foreach { b =>
        source.addData(b)
        q.processAllAvailable()
      }
      // far-future sentinel closes every real group's state
      source.addData((-1L, "flush doc", ts(base + 3600L * 1000)))
      q.processAllAvailable()
      source.addData((-2L, "flush doc two", ts(base + 7200L * 1000)))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT doc_id, n_passages, n_dup_passages, admitted FROM wpgate WHERE doc_id >= 0")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      val batch = Dedup.q76PassageGate(spark, sfDir)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
      assert(streamed == batch, "watermarked gate diverges from batch q76")
      // append mode emitted each verdict exactly once
      val emitted = spark.sql("SELECT doc_id FROM wpgate WHERE doc_id >= 0").collect()
      assert(emitted.length == batch.size, "append emitted duplicates or dropped verdicts")
      // the point of the exercise: state rows were evicted by the watermark
      val removed = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      assert(removed >= batch.size,
        s"expected every closed verdict's state evicted, saw numRowsRemoved=$removed")
    } finally q.stop()
  }

  test("bounded-state dedup: within-watermark duplicates drop, expired state re-emits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    def ts(hour: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $hour%02d:00:00")
    val q = EventStream.dedupStreamBounded(
      input.toDF().toDF("fp", "event_time"), "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("bdedup").start()
    try {
      input.addData(("A", ts(0)), ("A", ts(0)), ("B", ts(0)))
      q.processAllAvailable()
      // duplicate within the watermark window dropped
      assert(spark.sql("SELECT fp FROM bdedup").collect().map(_.getString(0)).sorted
        === Array("A", "B"))
      // advance event time far past the watermark, then repeat A: its
      // state expired, so it is emitted again — the bounded-state trade
      input.addData(("C", ts(10)))
      q.processAllAvailable()
      input.addData(("A", ts(10)))
      q.processAllAvailable()
      val fps = spark.sql("SELECT fp FROM bdedup").collect().map(_.getString(0)).sorted
      assert(fps === Array("A", "A", "B", "C"))
    } finally q.stop()
  }

  test("streaming aggregate lands in the JDBC serving layer via the upsert sink") {
    import java.sql.DriverManager
    val url = "jdbc:derby:memory:streamserve;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      """CREATE TABLE hourly_serve (
        |  bucket_start BIGINT NOT NULL,
        |  event_type VARCHAR(64) NOT NULL,
        |  n BIGINT,
        |  total_value DOUBLE)""".stripMargin)
    conn.close()

    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_events"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val checkpoint = java.nio.file.Files.createTempDirectory("serve_ckpt").toString
    val q = EventStream.toJdbc(
      EventStream.hourlyCounts(spark, dir.toString),
      url, "hourly_serve", Seq("bucket_start", "event_type"), checkpoint)
    try q.processAllAvailable() finally q.stop()

    val served = {
      val c = DriverManager.getConnection(url)
      val rs = c.createStatement().executeQuery(
        "SELECT bucket_start, event_type, n, total_value FROM hourly_serve")
      val buf = scala.collection.mutable.Map.empty[(Long, String), (Long, Double)]
      while (rs.next())
        buf((rs.getLong(1), rs.getString(2))) = (rs.getLong(3), rs.getDouble(4))
      c.close()
      buf.toMap
    }
    val batch = Relational.q19TimeWindow(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(served.keySet == batch.keySet)
    batch.foreach { case (k, (n, tv)) =>
      val (sn, stv) = served(k)
      assert(sn == n, s"count mismatch at $k")
      assert(math.abs(stv - tv) < 1e-9, s"total mismatch at $k")
    }
    assert(served.nonEmpty)
  }

  test("streaming near-dup gate: full replay flags exactly the docs sharing a bucket with an earlier doc") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String)]
    val q = EventStream.neardupGate(source.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("gate").start()
    try {
      // two micro-batches, deliberately NOT id-ordered across the split:
      // late batch docs must flag against early batch claims regardless of id
      val (late, early) = docs.partition(_._1 % 3 == 0)
      source.addData(early)
      q.processAllAvailable()
      source.addData(late)
      q.processAllAvailable()
      val hits = spark.sql("SELECT doc_id, band, first_doc FROM gate")
      val flagged = EventStream.neardupFlags(hits)
        .filter(col("is_candidate")).select("doc_id")
        .collect().map(_.getLong(0)).toSet

      // sequential reference fold in plain Scala, same arrival order
      val bands = Dedup.bandRowsFromSigs(Dedup.sigRows(docs.toDF("doc_id", "text")))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3)))
      val byDoc = bands.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val claims = scala.collection.mutable.Map.empty[(Int, Long, Long), Long]
      val expected = scala.collection.mutable.Set.empty[Long]
      Seq(early, late).foreach { batch =>
        val inBatch = batch.map(_._1).filter(byDoc.contains).sorted
        // within a batch the min doc_id claims (bucketFold's tie-break)
        inBatch.foreach { d =>
          byDoc(d).foreach(b => claims.getOrElseUpdate(b, d))
        }
        inBatch.foreach { d =>
          if (byDoc(d).exists(b => claims(b) != d)) expected += d
        }
      }
      assert(flagged == expected.toSet)
      assert(flagged.nonEmpty, "fixture produced no near-dup candidates")
    } finally q.stop()
  }

  test("stateful sessionization (flatMapGroupsWithState) agrees with the batch window formulation") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EventStream.Event].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(spark, source.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    try {
      source.addData(events)
      q.processAllAvailable()
      // push one far-future event per user so every open session closes
      val maxTs = events.map(_.ts).max
      val users = events.map(_.user_id).distinct
      source.addData(users.map(u =>
        EventStream.Event(-1L, maxTs + 10 * EventStream.SessionGapNs, u, "flush", 0.0, "")))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, session_start, session_end, n_events FROM sess")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      val batch = EventStream.sessionizeBatch(events.toDF())
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming funnel equals the batch q57 on event-time-ordered replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EventStream.Event].collect().sortBy(e => (e.ts, e.event_id)).toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[EventStream.Event]
    val q = EventStream.funnelStream(source.toDS())
      .writeStream.outputMode("append").format("memory").queryName("funnel").start()
    try {
      // three event-time-ordered micro-batches (users span batches, so
      // state genuinely carries across invocations)
      events.grouped(math.max(1, events.size / 3 + 1)).foreach { batch =>
        source.addData(batch)
        q.processAllAvailable()
      }
      val streamed = EventStream.funnelFinal(spark.sql("SELECT * FROM funnel"))
        .collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getInt(4))).toMap
      val batch = graft.operators.ScaleOps.q57Funnel(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getInt(4))).toMap
      assert(streamed == batch)
      assert(batch.values.exists(_._4 > 1), "fixture has no multi-stage funnels")
    } finally q.stop()
  }

  test("streaming transitions equal the batch q129 matrix on event-time-ordered replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EventStream.Event].collect().sortBy(e => (e.ts, e.event_id)).toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[EventStream.Event]
    val q = EventStream.transitionsStream(source.toDS())
      .writeStream.outputMode("append").format("memory").queryName("trans").start()
    try {
      // three event-time-ordered micro-batches: users span batches, so a
      // transition provably crosses a batch boundary through the state
      events.grouped(math.max(1, events.size / 3 + 1)).foreach { batch =>
        source.addData(batch)
        q.processAllAvailable()
      }
      val streamed = spark.sql(
        "SELECT from_type, to_type, count(*) AS n FROM trans GROUP BY 1, 2")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.operators.ScaleOps.q129Transitions(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
      assert(batch.values.sum > events.size / 2, "fixture has too few transitions")
    } finally q.stop()
  }

  test("stateless streaming seasonal gate equals batch q133 through the persisted profile") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val profDir = java.nio.file.Files.createTempDirectory("seasonal_prof").toString
    graft.operators.ScaleOps.seasonalProfile(spark, sfDir)
      .write.mode("overwrite").parquet(profDir)
    val prof = spark.read.parquet(profDir)
    val hourly = graft.Tables.events(spark, sfDir)
      .groupBy($"event_type", org.apache.spark.sql.functions.expr("ts div 3600000000000").as("hour"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .as[EventStream.HourlyCount].collect().sortBy(_.hour).toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[EventStream.HourlyCount]
    val q = EventStream.seasonalGateStream(source.toDS(), prof)
      .writeStream.outputMode("append").format("memory").queryName("seas").start()
    try {
      hourly.grouped(math.max(1, hourly.size / 2 + 1)).foreach { batch =>
        source.addData(batch)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT * FROM seas").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
      val batch = graft.operators.ScaleOps.q133Seasonal(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("streaming CUSUM against the persisted reference equals batch q131 on ordered replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // reference block persisted to parquet, read back — the artifact path
    val refDir = java.nio.file.Files.createTempDirectory("cusum_ref").toString
    graft.operators.ScaleOps.cusumReference(spark, sfDir)
      .write.mode("overwrite").parquet(refDir)
    val ref = spark.read.parquet(refDir)
    val hourly = graft.Tables.events(spark, sfDir)
      .groupBy($"event_type", org.apache.spark.sql.functions.expr("ts div 3600000000000").as("hour"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("x"))
      .as[EventStream.HourlyCount].collect().sortBy(_.hour).toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[EventStream.HourlyCount]
    val q = EventStream.cusumStream(source.toDS(), ref)
      .writeStream.outputMode("append").format("memory").queryName("cusum").start()
    try {
      hourly.grouped(math.max(1, hourly.size / 3 + 1)).foreach { batch =>
        source.addData(batch)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT * FROM cusum").collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
      val batch = graft.operators.ScaleOps.q131Cusum(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.values.exists(_._2 > 0))
    } finally q.stop()
  }

  test("watermarked funnel equals the batch q57 on scrambled (reverse-time) replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.Tables.events(spark, sfDir)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EventStream.Event].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[EventStream.Event]
    // lateness covers the corpus' full ~30-day span, so NOTHING is beyond
    // bound: the operator must reconstruct event-time order entirely from
    // its pending buffer
    val q = EventStream.funnelStreamWatermarked(source.toDS(), "35 days")
      .writeStream.outputMode("append").format("memory").queryName("wfunnel").start()
    try {
      // worst-case arrival order: newest events first, across three
      // micro-batches — every user's funnel order is inverted
      val reversed = events.sortBy(e => (-e.ts, e.event_id))
      reversed.grouped(math.max(1, reversed.size / 3 + 1)).foreach { batch =>
        source.addData(batch)
        q.processAllAvailable()
      }
      // a single far-future sentinel advances the GLOBAL watermark past
      // every real event; EventTimeTimeout then drains each user's buffer
      val maxTs = events.map(_.ts).max
      val fortyDaysNs = 40L * 24 * 3600 * 1000000000L
      source.addData(EventStream.Event(-1L, maxTs + fortyDaysNs,
        events.head.user_id, "flush", 0.0, ""))
      q.processAllAvailable()
      val streamed = EventStream.funnelFinal(spark.sql("SELECT * FROM wfunnel"))
        .collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getInt(4))).toMap
      val batch = graft.operators.ScaleOps.q57Funnel(spark, sfDir).collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getInt(4))).toMap
      assert(streamed == batch)
      assert(batch.values.exists(_._4 > 1), "fixture has no multi-stage funnels")
      // nothing was beyond the lateness bound, so nothing may be dropped
      val lateCounts = spark.sql("SELECT max(late_dropped) FROM wfunnel").collect()
      assert(lateCounts.head.getInt(0) == 0)
    } finally q.stop()
  }

  test("streaming quality gate verdicts equal the batch screens on full replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", "n_chars").as[(Long, String, Long)]
      .collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = MemoryStream[(Long, String, Long)]
    val q = EventStream.qualityGate(source.toDF().toDF("doc_id", "text", "n_chars"))
      .writeStream.outputMode("append").format("memory").queryName("qgate").start()
    try {
      // planted-PII rows prove the regex legs actually fire in the stream
      // (the synthetic corpus itself is PII-free): ids above the corpus
      // range, text long/clean enough that ONLY the PII veto rejects them
      val cleanBody = Seq.fill(40)("the and of to a in is it").mkString(" ")
      val planted = Seq(
        (900001L, s"$cleanBody reach me at alice@example.com today", 300L),
        (900002L, s"$cleanBody or call 555-1234 and 555-9876 now", 300L),
        // degenerate one-token doc: no 2-grams, so no repetition signal —
        // the gate must surface NULL (not a fake 0.0) and reject explicitly
        (900003L, "solo", 4L))
      val (a, b) = docs.splitAt(docs.size / 2)
      source.addData(a)
      q.processAllAvailable()
      source.addData(b ++ planted)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM qgate").collect()
        .map(r => r.getLong(0) ->
          (r.getDouble(1), Option(r.get(2)).map(_.asInstanceOf[Double]).getOrElse(-1.0),
            r.getInt(3), r.getInt(4), r.getBoolean(5)))
        .toMap
      assert(streamed.keySet == docs.map(_._1).toSet ++ planted.map(_._1))

      // batch cross-checks: quality from q22, repetition from q59 — the
      // stream must agree with the BATCH operators, not just with itself
      val quality = graft.operators.TextOps.q22Quality(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      val rep = graft.operators.TextOps.q59Repetition(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getDouble(3)).toMap
      docs.map(_._1).foreach { id =>
        val (qs, topFrac, ne, np, keep) = streamed(id)
        assert(qs == quality(id), s"doc $id quality")
        assert(topFrac == rep.getOrElse(id, 0.0), s"doc $id repetition")
        assert(ne == 0 && np == 0, s"doc $id: synthetic corpus has no PII")
        assert(keep == (qs >= 0.5 && topFrac < 0.5), s"doc $id keep policy")
      }
      // the planted rows are vetoed by PII alone
      val (q1, _, ne1, np1, keep1) = streamed(900001L)
      val (q2, _, ne2, np2, keep2) = streamed(900002L)
      assert(ne1 == 1 && np1 == 0 && !keep1 && q1 >= 0.5, "email veto")
      assert(ne2 == 0 && np2 == 2 && !keep2 && q2 >= 0.5, "phone veto")
      // the degenerate doc: NULL repetition fraction, explicit reject
      val (_, frac3, _, _, keep3) = streamed(900003L)
      assert(frac3 == -1.0, "one-token doc must surface NULL top_2gram_frac")
      assert(!keep3, "one-token doc must be rejected explicitly")
      assert(streamed.values.exists(_._5), "gate kept nothing")
    } finally q.stop()
  }

  test("stream-stream keyed interval join: 3-batch replay equals batch q122 (cross-batch pairs included)") {
    import spark.implicits._
    import graft.operators.ScaleOps
    val ev = graft.Tables.events(spark, sfDir)
    val raw = ev.selectExpr("ts", "event_type", "user_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val winNs = ScaleOps.AttrWindowUs * 1000L
    // cut inside a REAL same-user view→click window so a pair provably
    // spans a micro-batch boundary
    val split = (for {
      (c, tc, uc) <- raw if tc == "click"
      (v, tv, uv) <- raw if tv == "view" && uv == uc && v < c && c - v <= winNs
    } yield (v, c)).headOption
      .getOrElse(fail("fixture has no same-user attribution pair"))
    val t1 = split._1 / 2 + split._2 / 2 + 1
    val cuts = raw.map(_._1).sorted
    val t2 = math.max(t1 + 1, cuts(5 * cuts.length / 6))
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_attr"))
    dir.toFile.listFiles().foreach(_.delete())
    Seq($"ts" < t1, $"ts" >= t1 && $"ts" < t2, $"ts" >= t2).zipWithIndex
      .foreach { case (pred, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"attr$i")
        ev.filter(pred).coalesce(1).write.mode("overwrite")
          .parquet(tmp.toString)
        val part = tmp.toFile.listFiles()
          .find(_.getName.endsWith(".parquet")).get.toPath
        val dst = dir.resolve(s"batch$i.parquet")
        java.nio.file.Files.copy(part, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      }
    val q = EventStream.attributionStream(spark, dir.toString, Some(1))
      .writeStream.outputMode("append").format("memory").queryName("attr").start()
    try {
      q.processAllAvailable()
      val pairs = spark.sql("SELECT event_id, c_us, v_us FROM attr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // foreachBatch half: per-click count + latest view
      val streamed = pairs.groupBy(_._1).view
        .mapValues(g => (g.length.toLong, g.map(_._3).max)).toMap
      val batch = ScaleOps.q122IntervalJoin(spark, sfDir).collect()
        .filter(r => r.getLong(3) > 0)
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
      assert(streamed.keySet == batch.keySet,
        "clicks with attributed views diverge between stream and batch")
      streamed.foreach { case (id, (n, last)) =>
        assert(n == batch(id)._1, s"view count for click $id")
        assert(last == batch(id)._2, s"latest view for click $id")
      }
      assert(streamed.nonEmpty, "fixture produced no attribution pairs")
      val crossed = pairs.exists { case (_, cUs, vUs) =>
        (vUs < t1 / 1000 && cUs >= t1 / 1000) || (vUs < t2 / 1000 && cUs >= t2 / 1000)
      }
      assert(crossed, "no attribution pair spans a micro-batch boundary — join state untested")
    } finally q.stop()
  }

  test("stream-stream band join: time-ordered 3-batch replay equals batch q81 (cross-batch pairs included)") {
    import spark.implicits._
    import graft.operators.ScaleOps
    // stage the events as THREE time-ordered files so maxFilesPerTrigger=1
    // yields three micro-batches: the watermark advances correctly (ordered
    // replay) and band pairs that SPAN a batch boundary must come from the
    // join's buffered state, not from same-batch luck
    val ev = graft.Tables.events(spark, sfDir)
    // place the first cut at the midpoint of a REAL band pair so at least
    // one pair provably spans a micro-batch boundary (a random cut over a
    // sparse fixture would almost never split one)
    val raw = ev.selectExpr("ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bandNs = ScaleOps.BandUs * 1000L
    val split = (for {
      (p, tp) <- raw if tp == "purchase"
      (c, tc) <- raw if tc == "click" && c != p && math.abs(c - p) <= bandNs
    } yield (math.min(p, c), math.max(p, c))).headOption
      .getOrElse(fail("fixture has no band pair with distinct timestamps"))
    val t1 = split._1 / 2 + split._2 / 2 + 1 // strictly inside the pair's gap
    val cuts = raw.map(_._1).sorted
    val t2 = math.max(t1 + 1, cuts(5 * cuts.length / 6))
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target/stream_band"))
    dir.toFile.listFiles().foreach(_.delete())
    Seq($"ts" < t1, $"ts" >= t1 && $"ts" < t2, $"ts" >= t2).zipWithIndex
      .foreach { case (pred, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"band$i")
        ev.filter(pred).coalesce(1).write.mode("overwrite")
          .parquet(tmp.toString)
        val part = tmp.toFile.listFiles()
          .find(_.getName.endsWith(".parquet")).get.toPath
        val dst = dir.resolve(s"batch$i.parquet")
        java.nio.file.Files.copy(part, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // FileStreamSource orders by modification time — pin the replay order
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
      }
    val q = EventStream.bandJoinStream(spark, dir.toString, Some(1))
      .writeStream.outputMode("append").format("memory").queryName("band").start()
    try {
      q.processAllAvailable()
      val pairs = spark.sql("SELECT event_id, c_us, value FROM band").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // batch-side aggregation (the foreachBatch half), then compare with
      // the batch operator's nonzero rows
      val streamed = pairs.groupBy(_._1).view.mapValues { g =>
        val v = g.map(p => BigDecimal(p._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .foldLeft(BigDecimal(0))(_ + _)
        (g.length.toLong, v.toDouble)
      }.toMap
      val batch = ScaleOps.q81BandJoin(spark, sfDir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3))))
        .filter(_._2._1 > 0).toMap
      assert(streamed.keySet == batch.keySet,
        "purchases with nearby clicks diverge between stream and batch")
      streamed.foreach { case (id, (n, v)) =>
        assert(n == batch(id)._1, s"pair count for purchase $id")
        assert(math.abs(v - batch(id)._2) < 1e-9, s"value sum for purchase $id")
      }
      assert(streamed.nonEmpty, "fixture produced no band pairs")
      // the replay must have genuinely crossed batch boundaries
      val pUsById = ScaleOps.q81BandJoin(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val crossed = pairs.exists { case (id, cUs, _) =>
        val pUs = pUsById(id)
        (pUs < t1 / 1000 && cUs >= t1 / 1000) || (cUs < t1 / 1000 && pUs >= t1 / 1000) ||
          (pUs < t2 / 1000 && cUs >= t2 / 1000) || (cUs < t2 / 1000 && pUs >= t2 / 1000)
      }
      assert(crossed,
        s"no pair spans a micro-batch boundary (cut $t1 was placed inside pair $split) — join state untested")
    } finally q.stop()
  }
}
