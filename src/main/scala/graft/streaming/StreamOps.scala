package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GridConfig

/**
 * Structured Streaming over geotagged event streams: the batch tile math
 * reused unchanged on an unbounded source (the reference has no streaming;
 * this is part of the engine's training-data-pipeline surface).
 *
 * Events are geotagged deterministically from user_id (the streaming
 * analogue of the url/text geotagger), assigned their fine/coarse tile with
 * the same codegen column expressions as the batch path, then aggregated
 * into event-time windows with a watermark for state cleanup.
 */
object StreamOps {

  /** Deterministic user geotag (same integer-derivation style as the batch
    * oracle queries — SQL-checkable in batch mode). */
  def geotagEvents(events: DataFrame): DataFrame =
    events
      // event-time watermarks require TIMESTAMP (testdata ships NTZ)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("x", (col("user_id") * 7 % 3600) / 10.0 - 180.0)
      .withColumn("y", (col("user_id") * 11 % 1700) / 10.0 - 85.0)

  /** Add fine + coarse tile columns (pure column expressions, codegen). */
  def withTileColumns(df: DataFrame, grid: GridConfig): DataFrame = {
    val fi = least(greatest(
      floor((col("x") - lit(grid.xMin)) / lit(grid.fineExtX)).cast("long"),
      lit(0L)), lit(grid.globalPpd - 1L))
    val fj = least(greatest(
      floor((col("y") - lit(grid.yMin)) / lit(grid.fineExtY)).cast("long"),
      lit(0L)), lit(grid.globalPpd - 1L))
    val fpc = grid.finePerCoarse.toDouble
    df.withColumn("tile", fi + fj * grid.globalPpd)
      .withColumn("coarse_tile",
        floor(fi / lit(fpc)).cast("long") +
          floor(fj / lit(fpc)).cast("long") * grid.coarsePpd)
  }

  /**
   * Windowed per-coarse-tile aggregation with watermarking: counts + value
   * sums per (event-time window, coarse tile). Works identically on a
   * streaming or batch DataFrame — the streaming test drives it with
   * readStream, the batch oracle with read.
   */
  def tileWindowCounts(events: DataFrame, grid: GridConfig,
                       windowLen: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val tagged = withTileColumns(geotagEvents(events), grid)
    val wm = if (tagged.isStreaming) tagged.withWatermark("ts", watermark) else tagged
    wm.groupBy(window(col("ts"), windowLen), col("coarse_tile"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("coarse_tile"),
        col("n"), col("total_value"))
  }
}
