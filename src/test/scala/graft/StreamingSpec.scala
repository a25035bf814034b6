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
    val streamTs =
      if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else stream
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
}
