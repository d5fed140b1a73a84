package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** The reference's 7 golden queries through the full Spark engine path
  * (tile shuffle → MBR filter → dedup → refinement). */
class GoldenEngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val samples = "/root/reference/Hecatoncheir/test/samples"

  def loadDs(file: String, gtype: Int) =
    GeoEngine.readWkt(spark, s"$samples/$file", gtype)

  test("engine test1: find-relation join = {INTERSECT:4, INSIDE:1}") {
    val r = loadDs("data_sample_polygons_1.wkt", GeomType.POLYGON)
    val s = loadDs("data_sample_polygons_2.wkt", GeomType.POLYGON)
    val grid = GeoEngine.gridFor(GeoEngine.dataspace(r, s))
    val rels = GeoEngine.findRelationJoin(r, s, grid)
      .groupBy("relation").count().collect()
      .map(row => row.getInt(0) -> row.getLong(1)).toMap
    assert(rels == Map(Topology.TR_INTERSECT -> 4L, Topology.TR_INSIDE -> 1L), s"got $rels")
  }

  test("engine test2: intersection join = 5 pairs (exact id set)") {
    val r = loadDs("data_sample_polygons_1.wkt", GeomType.POLYGON)
    val s = loadDs("data_sample_polygons_2.wkt", GeomType.POLYGON)
    val grid = GeoEngine.gridFor(GeoEngine.dataspace(r, s))
    val pairs = GeoEngine.spatialJoin(r, s, Predicates.INTERSECTS, grid)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(pairs == Set((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)), s"got $pairs")
  }

  test("engine test2 with APRIL intermediate filter: identical result") {
    val r = loadDs("data_sample_polygons_1.wkt", GeomType.POLYGON)
    val s = loadDs("data_sample_polygons_2.wkt", GeomType.POLYGON)
    val grid = GeoEngine.gridFor(GeoEngine.dataspace(r, s))
    val pairs = GeoEngine.spatialJoin(r, s, Predicates.INTERSECTS, grid, useApril = true)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(pairs == Set((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)), s"got $pairs")
  }

  test("find-relation with APRIL topology filter == without (all relations)") {
    val r = loadDs("data_sample_polygons_1.wkt", GeomType.POLYGON)
    val s = loadDs("data_sample_polygons_2.wkt", GeomType.POLYGON)
    val grid = GeoEngine.gridFor(GeoEngine.dataspace(r, s))
    def rels(useApril: Boolean) =
      GeoEngine.findRelationJoin(r, s, grid, useApril)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(rels(useApril = true) == rels(useApril = false))
  }

  test("engine test3: polygons x linestrings intersection join = 0") {
    val r = loadDs("data_sample_polygons_1.wkt", GeomType.POLYGON)
    val s = loadDs("data_sample_linestrings.wkt", GeomType.LINESTRING)
    val grid = GeoEngine.gridFor(GeoEngine.dataspace(r, s))
    assert(GeoEngine.spatialJoin(r, s, Predicates.INTERSECTS, grid).count() == 0)
  }

  test("engine test4: batch kNN k=2 = [33,31] and [53,58] ascending") {
    val pts = loadDs("data_sample_points.wkt", GeomType.POINT)
    val queries = GeoEngine.loadQueriesWkt(s"$samples/query_sample_points.wkt", GeomType.POINT)
    val res = GeoEngine.knnBatch(pts, queries, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }
    assert(res(0L) == Seq(33L, 31L), s"got $res")
    assert(res(1L) == Seq(53L, 58L), s"got $res")
  }

  test("engine test5: batch range COUNT on points = {0:0, 1:1}") {
    val pts = loadDs("data_sample_points.wkt", GeomType.POINT)
    val grid = GeoEngine.gridFor(GeoEngine.dataspace(pts))
    val queries = GeoEngine.loadQueriesWkt(s"$samples/query_sample_polygons.wkt", GeomType.POLYGON)
    val counts = GeoEngine.rangeBatch(pts, queries, grid)
      .groupBy("qid").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse(0L, 0L) == 0L, s"got $counts")
    assert(counts.getOrElse(1L, 0L) == 1L, s"got $counts")
  }

  test("engine test6: batch range COLLECT on polygons = empty") {
    val polys = loadDs("data_sample_polygons_2.wkt", GeomType.POLYGON)
    val grid = GeoEngine.gridFor(GeoEngine.dataspace(polys))
    val queries = GeoEngine.loadQueriesWkt(s"$samples/query_sample_polygons.wkt", GeomType.POLYGON)
    assert(GeoEngine.rangeBatch(polys, queries, grid).count() == 0)
  }

  test("engine test7: distance join d=7.65 = 5 pairs") {
    val r = loadDs("data_sample_points.wkt", GeomType.POINT)
    val s = loadDs("query_sample_points.wkt", GeomType.POINT)
    val grid = GeoEngine.gridFor(GeoEngine.dataspace(r, s))
    assert(GeoEngine.distanceJoin(r, s, 7.65, grid).count() == 5)
  }
}
