package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps
import graft.web.Pages

/** Streaming tile aggregation: the streaming query over the events parquet
  * must produce exactly the batch result (same grid, same windows). */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming windowed tile counts == batch result on the same data") {
    val grid = Pages.WorldGrid
    val dir = "/root/testdata/sf0.001"
    val batchDf = spark.read.parquet(s"$dir/events.parquet")
    val batchResult = StreamOps.tileWindowCounts(batchDf, grid).collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(batchResult.nonEmpty)

    // file stream source needs a directory; stage the parquet into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val streaming = StreamOps.tileWindowCounts(
      spark.readStream.schema(batchDf.schema).parquet(streamDir.toString),
      grid)
    val q = streaming.writeStream
      .outputMode("complete")
      .format("memory").queryName("tile_counts")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamResult = spark.table("tile_counts").collect()
      .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamResult == batchResult,
      s"stream=${streamResult.size} rows, batch=${batchResult.size} rows")
  }
}
