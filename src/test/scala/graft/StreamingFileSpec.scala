package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end file-source streaming: readStream over a growing parquet
  * directory → transform → exactly-once parquet sink with checkpoint
  * recovery across a query restart (the deployment shape of the
  * streaming twins; MemoryStream covers semantics, this covers the
  * source/sink/checkpoint machinery). */
class StreamingFileSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("parquet->parquet streaming is exactly-once across restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_stream")
    val (src, out, ckpt) = (s"$base/src", s"$base/out", s"$base/ckpt")
    val events = Tables.table(spark, sf, "events")
      .select("event_id", "ts_us", "user_id", "event_type", "value")
    val chunks = events.collect().grouped(400).toSeq
    def writeChunk(i: Int): Unit =
      spark.createDataFrame(
        spark.sparkContext.parallelize(chunks(i).toSeq, 1), events.schema)
        .write.mode("append").parquet(src)

    def startQuery() = spark.readStream.schema(events.schema).parquet(src)
      .filter(col("event_type") === "purchase")
      .withColumn("value_cents",
        expr("cast(round(value * 100) as bigint)"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    assert(chunks.size >= 2, "fixture too small to exercise a restart")
    // all but the last chunk before the restart, the last one after;
    // the source dir must exist before the stream starts
    writeChunk(0)
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      chunks.indices.drop(1).dropRight(1).foreach { i =>
        writeChunk(i)
        q1.processAllAvailable()
      }
    } finally q1.stop()
    // restart from the checkpoint; only the new chunk may be processed
    writeChunk(chunks.size - 1)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val streamed = spark.read.parquet(out)
    val expected = events.filter(col("event_type") === "purchase")
    assert(streamed.count() === expected.count(), "exactly-once violated")
    assert(streamed.join(expected, Seq("event_id"), "left_anti")
      .count() === 0)
    assert(streamed.agg(sum("value_cents")).head.getLong(0) ===
      expected.agg(sum(expr("cast(round(value * 100) as bigint)")))
        .head.getLong(0))
  }
}
