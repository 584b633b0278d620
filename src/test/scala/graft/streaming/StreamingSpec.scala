package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types.StructType

import graft.SparkSpec
import graft.sink.StagedLoader

class StreamingSpec extends SparkSpec {

  private lazy val eventsDir: String = {
    // materialize the µs-converted events as a streamable parquet dir
    val dir = Files.createTempDirectory("graft-stream-src").toString
    graft.ops.Tables.events(spark, sf).write.mode("overwrite").parquet(dir)
    dir
  }
  private lazy val schema: StructType = spark.read.parquet(eventsDir).schema

  test("streaming windowed counts equal the batch tumbling-window counts") {
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val q = StreamingArchiver.windowedCounts(stream, "ts", "24 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .select("win_start", "n").collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      val batch = spark.read.parquet(eventsDir)
        .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "24 hours"))
        .count().select("window.start", "count").collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
      assert(streamed.values.sum == spark.read.parquet(eventsDir).count())
    } finally q.stop()
  }

  test("foreachBatch staged-load archive drains the stream into the target") {
    val tgt = Files.createTempDirectory("graft-stream-tgt").toString + "/t"
    val loader = new StagedLoader(spark, tgt, schema)
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
    val q = StreamingArchiver.archiveStream(stream, loader,
      tgt + ".stg", tgt + ".ckpt")
    try q.awaitTermination(120000) finally q.stop()
    val loaded = spark.read.schema(schema).parquet(tgt).count()
    assert(loaded == spark.read.parquet(eventsDir).count())
  }
}
