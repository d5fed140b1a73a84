package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.store.Snapshots
import graft.web.Pages

/**
 * spark-submit entry point: the full web-scale pipeline as resumable stages
 * with snapshot checkpoints + per-partition lineage/metrics (north rule).
 *
 *   spark-submit --class graft.GraftJob <jar> <snapshotRoot> [nPages]
 *
 * Stages (each a committed snapshot; a restarted run resumes from the last
 * committed stage without recomputation):
 *   1. pages      — ingest (here: deterministic synthesis; swap for an
 *                   Iceberg/parquet read of a real crawl)
 *   2. geotagged  — deterministic url/text geotag
 *   3. tiles      — Dataset[TileAssignment] on the world grid + hex cells
 *   4. joined     — spatial join page-points × box table (salted)
 *
 * Every manifest records lineage (stage inputs + parameters + app version)
 * and per-partition row counts alongside the snapshot.
 */
object GraftJob {
  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "/tmp/graft_snapshots"
    val nPages = if (args.length > 1) args(1).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // spark-submit provides the master; local runs fall back to local[N]
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val grid = Pages.WorldGrid
    val version = "graft-0.1.0"

    val pages = Snapshots.runStage(spark, root, "pages",
      Map("stage" -> "ingest", "n_pages" -> nPages.toString, "app" -> version)) {
      Pages.synthesize(spark, nPages).toDF()
    }

    val tagged = Snapshots.runStage(spark, root, "geotagged",
      Map("stage" -> "geotag", "input" -> "pages", "app" -> version)) {
      // 64-bit ids: hash() is 32-bit Murmur3 (birthday collisions from ~1e5
      // urls), and spatialJoin's slim-mode re-join-by-id plus snapshot
      // lineage require unique ids — fnv64 keeps them collision-free at the
      // 1e12-row north rule. Codegen expression, not a UDF.
      Pages.geotag(pages)
        .withColumn("id", graft.functions.GeoExprs.fnv64(col("url")))
        .select("id", "url", "x", "y")
    }

    val tiles = Snapshots.runStage(spark, root, "tiles",
      Map("stage" -> "tile_assign", "input" -> "geotagged",
          "grid" -> s"${grid.coarsePpd}/${grid.globalPpd}", "hex_res" -> "7",
          "app" -> version)) {
      GeoEngine.tileAssignments(tagged, grid, hexRes = 7).toDF()
    }

    val joined = Snapshots.runStage(spark, root, "joined",
      Map("stage" -> "spatial_join", "input" -> "geotagged+boxes",
          "predicate" -> "intersects", "app" -> version)) {
      val pts = tagged.select(col("id"), lit(GeomType.POINT).as("gtype"),
        array(col("x"), col("y")).as("coords"),
        col("x").as("xmin"), col("y").as("ymin"),
        col("x").as("xmax"), col("y").as("ymax")).as[GeoRow]
      val boxes = spark.range(2000).select(col("id"), lit(GeomType.BOX).as("gtype"),
        ((col("id") * 13 % 2800) / 8.0 - 175.0).as("cx"),
        ((col("id") * 17 % 1280) / 8.0 - 80.0).as("cy"),
        ((col("id") % 40 + 2) / 8.0).as("hw"), ((col("id") % 30 + 2) / 8.0).as("hh"))
        .select(col("id"), col("gtype"),
          array(col("cx") - col("hw"), col("cy") - col("hh"),
                col("cx") + col("hw"), col("cy") - col("hh"),
                col("cx") + col("hw"), col("cy") + col("hh"),
                col("cx") - col("hw"), col("cy") + col("hh"),
                col("cx") - col("hw"), col("cy") - col("hh")).as("coords"),
          (col("cx") - col("hw")).as("xmin"), (col("cy") - col("hh")).as("ymin"),
          (col("cx") + col("hw")).as("xmax"), (col("cy") + col("hh")).as("ymax"))
        .as[GeoRow]
      // broadcast-vs-shuffle picked by the size-based chooser, not hard-coded
      // — this job is the template users copy
      GeoEngine.spatialJoinAuto(pts, boxes, Predicates.INTERSECTS, grid)
    }

    println(s"""{"job":"graft-pipeline","pages":${pages.count()},""" +
      s""""tiles":${tiles.count()},"joined":${joined.count()},""" +
      s""""snapshots":"${Seq("pages", "geotagged", "tiles", "joined")
        .map(t => s"$t=snap-${Snapshots.latestId(root, t).getOrElse(0L)}")
        .mkString(",")}"}""")
    spark.stop()
  }
}
