package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming capability proof (beyond the reference's surface —
  * it is batch-only, SURVEY §1): the events table driven through
  * readStream → watermark → tumbling-window agg → memory sink, asserted
  * equal to the batch formulation of the same window. The partitioning key
  * (window, event_type) is exactly the state key a production stream of
  * this pipeline would use. */
class StreamingSpec extends SparkSpec {

  /** Stage the single events.parquet into a directory (FileStreamSource
    * requires one), normalizing ts to session-zoned TIMESTAMP exactly like
    * Tables.events (legacy nanos→Long and naive-micros→NTZ generations
    * both occur in driver testdata). */
  private def stagedEventsStream(extraFiles: Seq[java.nio.file.Path] = Nil)
      : (org.apache.spark.sql.DataFrame, java.nio.file.Path) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("00-events.parquet"))
    extraFiles.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f, dir.resolve(s"0${i + 1}-extra.parquet"))
    }
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val streamTs = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        stream.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => stream
    }
    (streamTs, dir)
  }

  /** ts column of a staged extra file, matching the raw events schema so
    * FileStreamSource reads both file generations uniformly. */
  private def castToRawTs(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr("CAST(ts AS TIMESTAMP_NTZ)"))
      case _ => df
    }

  test("flatMapGroupsWithState sessionization matches the batch plan") {
    import spark.implicits._
    val t = Tables(spark, sf)
    // sentinel file: one far-future event for a user id outside the data —
    // its arrival advances the watermark past every real session's
    // (end + gap), firing the event-time timeouts that close them
    val maxTs = t.events.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 30L * 86400 * 1000)
    val sentinelUser = -1L
    val sentinelFile = java.nio.file.Files.createTempDirectory("graft-sentinel")
    val sentinel = Seq((999999999L, sentinelTs, sentinelUser, "view", 0.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sentinelCast = castToRawTs(sentinel)
    sentinelCast.coalesce(1).write.mode("overwrite")
      .parquet(sentinelFile.resolve("s").toString)
    val sentinelParquet = java.nio.file.Files
      .list(sentinelFile.resolve("s")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head

    val (stream, _) = stagedEventsStream(
      Seq(java.nio.file.Paths.get(sentinelParquet)))
    val sessions = graft.streaming.StreamOps.sessionize(
      stream, gapMinutes = 30, watermarkDelay = "10 seconds")
    val qname = "stream_sess_" + System.nanoTime()
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(qname)
        .filter(col("user_id") =!= sentinelUser)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("session_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), math.rint(r.getDouble(4) * 1e6)))
        .toSet
      // batch twin: the OpsEvents lag/window formulation at the same gap
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapUs = 30L * 60 * 1000000
      val batch = t.events
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(byUser
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          sum(col("value")).as("session_value"))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("session_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), math.rint(r.getDouble(4) * 1e6)))
        .toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionize extends session START for late in-gap events") {
    import spark.implicits._
    // file 1: one event at T+10min; file 2: a LATE event at T (earlier,
    // within gap + watermark) then a far-future sentinel to flush state.
    // The closed session must span [T, T+10min] with both events counted.
    val base = java.sql.Timestamp.valueOf("2024-06-01 12:10:00")
    val early = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    val flush = java.sql.Timestamp.valueOf("2024-09-01 00:00:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-late")
    def write(name: String, rows: Seq[(Long, java.sql.Timestamp, Double)]) =
      rows.toDF("user_id", "ts", "value").coalesce(1)
        .write.mode("overwrite").parquet(dir.resolve(name).toString)
    write("f1", Seq((1L, base, 1.0)))
    write("f2", Seq((1L, early, 2.0), (99L, flush, 0.0)))
    val staged = java.nio.file.Files.createTempDirectory("graft-late-src")
    Seq("f1", "f2").zipWithIndex.foreach { case (n, i) =>
      val src = java.nio.file.Files.list(dir.resolve(n)).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(java.nio.file.Paths.get(src),
        staged.resolve(s"0$i-$n.parquet"))
    }
    val schema = spark.read.parquet(staged.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staged.toString)
    val sessions = graft.streaming.StreamOps.sessionize(
      stream, gapMinutes = 30, watermarkDelay = "1 hour")
    val qname = "stream_late_" + System.nanoTime()
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try {
      q.processAllAvailable()
      val out = spark.table(qname).filter(col("user_id") === 1L).collect()
      assert(out.length == 1)
      val r = out.head
      assert(r.getAs[java.sql.Timestamp]("session_start") == early)
      assert(r.getAs[java.sql.Timestamp]("session_end") == base)
      assert(r.getAs[Long]("n_events") == 2L)
      assert(math.abs(r.getAs[Double]("session_value") - 3.0) < 1e-9)
    } finally q.stop()
  }

  test("streaming exact dedup drops duplicate events within the watermark") {
    val (stream, _) = stagedEventsStream()
    // the staged file read twice would dup everything; within one file,
    // dedup on (user_id, event_type, ts) must match batch distinct
    val dd = graft.streaming.StreamOps.dedupExact(
      stream, Seq("user_id", "event_type"), "ts", "1 hour")
    val qname = "stream_dd_" + System.nanoTime()
    val q = dd.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(qname).count()
      val batch = Tables(spark, sf).events
        .dropDuplicates(Seq("user_id", "event_type", "ts")).count()
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming Bloom dedup: duplicates dropped across micro-batches " +
    "from fixed-size state (no watermark eviction needed)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = graft.streaming.StreamOps.bloomDedup(
      in.toDF.toDF("event_id", "ts", "user_id", "event_type"),
      keys = Seq("user_id", "event_type"))
    val qname = "stream_bd_" + System.nanoTime()
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try {
      // batch 1: three distinct keys plus an in-batch duplicate of (1,view)
      in.addData((1L, ts(0), 1L, "view"), (2L, ts(1), 1L, "click"),
        (3L, ts(2), 2L, "view"), (4L, ts(3), 1L, "view"))
      q.processAllAvailable()
      // batch 2: a CROSS-batch duplicate of (1,click) — dropping it proves
      // the Bloom state carried — plus one genuinely new key
      in.addData((5L, ts(10), 1L, "click"), (6L, ts(11), 2L, "click"))
      q.processAllAvailable()
      val got = spark.table(qname)
        .select("event_id", "user_id", "event_type").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == Set((1L, 1L, "view"), (2L, 1L, "click"),
        (3L, 2L, "view"), (6L, 2L, "click")),
        s"wrong surviving set: $got")
    } finally q.stop()
  }

  test("streaming Bloom dedup over the whole events table equals batch " +
    "distinct-by-key — full dup recall, zero false positives at this fill") {
    val (stream, _) = stagedEventsStream()
    val out = graft.streaming.StreamOps.bloomDedup(
      stream, keys = Seq("user_id", "event_type", "ts"))
    val qname = "stream_bd2_" + System.nanoTime()
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(qname).count()
      val batch = Tables(spark, sf).events
        .dropDuplicates(Seq("user_id", "event_type", "ts")).count()
      // equality is a TWO-sided claim: every duplicate dropped (recall)
      // AND no distinct key falsely dropped (the ~1% fill makes the FP
      // term deterministically zero on this corpus)
      assert(streamed == batch, s"streamed $streamed != batch $batch")
    } finally q.stop()
  }

  test("streaming segment Bloom dedup: cross-batch duplicate segments " +
    "dropped, batch-mode canonical order within a batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val in = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamOps.segmentBloomDedup(
      in.toDF.toDF("doc_id", "text"), "doc_id", "text", segWords = 4)
    val qname = "stream_seg_" + System.nanoTime()
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try {
      // batch 1: docs 1 and 2 share their first segment; min doc id wins
      in.addData((1L, "a b c d e f g h"), (2L, "a b c d x y z w"))
      q.processAllAvailable()
      // batch 2: doc 3 repeats doc 1's SECOND segment (cross-batch dup)
      // plus one new segment
      in.addData((3L, "e f g h n o p q"))
      q.processAllAvailable()
      val got = spark.table(qname)
        .select("doc_id", "chunk_ix", "chunk_text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(got == Set(
        (1L, 0L, "a b c d"), (1L, 1L, "e f g h"),
        (2L, 1L, "x y z w"), (3L, 1L, "n o p q")),
        s"wrong surviving segment set: $got")
      // the same corpus through the batch operator keeps the same
      // SEGMENT TEXT multiset (canonical owner may differ by arrival)
      val batchKept = graft.operators.Dedup.segmentDedup(
          Seq((1L, "a b c d e f g h"), (2L, "a b c d x y z w"),
            (3L, "e f g h n o p q")).toDF("doc_id", "text"),
          "doc_id", "text", 4)
        .agg(sum(col("n_seg") - col("n_dup"))).first().getLong(0)
      assert(got.size.toLong == batchKept)
    } finally q.stop()
  }

  test("streamed tumbling-window counts match the batch plan") {
    val t = Tables(spark, sf)
    // FileStreamSource requires a directory; stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = spark.readStream.schema(rawSchema)
      .parquet(dir.toString)
    val streamTs = rawSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        stream.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => stream
    }
    val agg = streamTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val qname = "stream_out_" + System.nanoTime()
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(qname)
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = t.events
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("RocksDB state store: windowed agg and custom-state transitions " +
    "produce the same outputs as the default provider") {
    // The 100 TB bounded-state claim rides on a disk-backed store — state
    // larger than executor memory must spill to local RocksDB instead of
    // OOMing the HDFSBackedStateStore's in-memory map. Same computations
    // as the in-memory-provider tests, same expected outputs.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      // stateful windowed aggregation over the staged events table
      val t = Tables(spark, sf)
      val (stream, _) = stagedEventsStream()
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val qname = "stream_rocks_" + System.nanoTime()
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname).start()
      try {
        q.processAllAvailable()
        val streamed = spark.table(qname)
          .select(col("window.start").as("ws"), col("event_type"), col("n"))
          .collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
        val batch = t.events
          .groupBy(window(col("ts"), "6 hours"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(col("window.start").as("ws"), col("event_type"), col("n"))
          .collect()
          .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
        assert(streamed.nonEmpty && streamed == batch)
      } finally q.stop()
      // custom flatMapGroupsWithState state (transitions frontier) under
      // RocksDB, across micro-batches
      implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          .sqlContext
      def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
      val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      val out = graft.streaming.StreamOps.transitions(
        in.toDF.toDF("user_id", "ts", "event_id", "event_type"))
      val qname2 = "stream_rocks_tr_" + System.nanoTime()
      val q2 = out.writeStream.outputMode("append")
        .format("memory").queryName(qname2).start()
      try {
        in.addData((1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "click"))
        q2.processAllAvailable()
        in.addData((1L, ts(5), 3L, "purchase"), (1L, ts(0), 4L, "stale"))
        q2.processAllAvailable()
        val got = spark.table(qname2)
          .select("user_id", "from_type", "to_type")
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
        assert(got == Set((1L, "view", "click"), (1L, "click", "purchase")))
      } finally q2.stop()
      // event-time TIMER state (flatMapGroupsWithState sessionize with
      // EventTimeTimeout) under RocksDB — timers are a separate state
      // surface from the value store; the late in-gap event must still
      // extend the session start before the timeout closes it
      val base = java.sql.Timestamp.valueOf("2024-06-01 12:10:00")
      val early = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
      val flush = java.sql.Timestamp.valueOf("2024-09-01 00:00:00")
      val dir = java.nio.file.Files.createTempDirectory("graft-rocks-sess")
      def write(name: String,
                rows: Seq[(Long, java.sql.Timestamp, Double)]) =
        rows.toDF("user_id", "ts", "value").coalesce(1)
          .write.mode("overwrite").parquet(dir.resolve(name).toString)
      write("f1", Seq((1L, base, 1.0)))
      write("f2", Seq((1L, early, 2.0), (99L, flush, 0.0)))
      val staged = java.nio.file.Files.createTempDirectory("graft-rocks-src")
      Seq("f1", "f2").zipWithIndex.foreach { case (n, i) =>
        val src = java.nio.file.Files.list(dir.resolve(n)).toArray
          .map(_.toString).filter(_.endsWith(".parquet")).head
        java.nio.file.Files.copy(java.nio.file.Paths.get(src),
          staged.resolve(s"0$i-$n.parquet"))
      }
      val schema = spark.read.parquet(staged.toString).schema
      val sessStream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staged.toString)
      val sessions = graft.streaming.StreamOps.sessionize(
        sessStream, gapMinutes = 30, watermarkDelay = "1 hour")
      val qname3 = "stream_rocks_sess_" + System.nanoTime()
      val q3 = sessions.writeStream.outputMode("append")
        .format("memory").queryName(qname3).start()
      try {
        q3.processAllAvailable()
        val out = spark.table(qname3).filter(col("user_id") === 1L).collect()
        assert(out.length == 1)
        val r = out.head
        assert(r.getAs[java.sql.Timestamp]("session_start") == early)
        assert(r.getAs[java.sql.Timestamp]("session_end") == base)
        assert(r.getAs[Long]("n_events") == 2L)
        assert(math.abs(r.getAs[Double]("session_value") - 3.0) < 1e-9)
      } finally q3.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming transitions carry the frontier across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = graft.streaming.StreamOps.transitions(
      in.toDF.toDF("user_id", "ts", "event_id", "event_type"))
    val qname = "stream_tr_" + System.nanoTime()
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try {
      // batch 1: user 1 does view -> click; user 2 does view
      in.addData((1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "click"),
        (2L, ts(0), 3L, "view"))
      q.processAllAvailable()
      // batch 2: frontier continuation (click -> purchase), plus an event
      // BEHIND user 1's frontier that must be dropped, and user 2's next
      in.addData((1L, ts(5), 4L, "purchase"), (1L, ts(0), 5L, "stale"),
        (2L, ts(9), 6L, "click"))
      q.processAllAvailable()
      val got = spark.table(qname)
        .select("user_id", "from_type", "to_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet
      assert(got == Set(
        (1L, "view", "click"), (1L, "click", "purchase"),
        (2L, "view", "click")))
    } finally q.stop()
  }

  test("streaming transitions over the events table match batch lead()") {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, sf)
    val (stream, _) = stagedEventsStream()
    val out = graft.streaming.StreamOps.transitions(stream)
    val qname = "stream_tr2_" + System.nanoTime()
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(qname).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table(qname)
        .groupBy("from_type", "to_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val batch = t.events
        .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type"), col("to_type")).count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming HLL distinct sketch equals the batch sketch at every " +
    "micro-batch boundary — order-independent mergeable state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    val in = MemoryStream[(String, String)]
    val out = graft.streaming.StreamOps.distinctSketch(
      in.toDF.toDF("src", "fp"), "src", "fp")
    val qname = "stream_hll_" + System.nanoTime()
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName(qname).start()
    def batchEst(rows: Seq[(String, String)]) = rows.toDF("src", "fp")
      .groupBy(col("src"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(fp))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def streamEst() = spark.table(qname)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    try {
      val b1 = (1 to 200).map(i => ("a", s"f${i % 120}")) ++
        (1 to 50).map(i => ("b", s"g$i"))
      in.addData(b1: _*)
      q.processAllAvailable()
      assert(streamEst() == batchEst(b1))
      // batch 2 re-sends half of batch 1 (cross-batch dedup counting) and
      // adds new values — the carried sketch must absorb both exactly as
      // a single batch pass over the union would
      val b2 = (1 to 100).map(i => ("a", s"f${i % 120}")) ++
        (1 to 80).map(i => ("b", s"g${i + 25}")) :+ ("c", "h1")
      in.addData(b2: _*)
      q.processAllAvailable()
      assert(streamEst() == batchEst(b1 ++ b2))
    } finally q.stop()
  }
}
