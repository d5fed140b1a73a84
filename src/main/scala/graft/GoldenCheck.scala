package graft

import org.apache.spark.sql.SparkSession
import graft.core._

/**
 * The reference's golden queries as a spark-submit-able main, so the same
 * assertions the sbt suite makes (GoldenEngineSpec) can run under ANY
 * master — in particular `local-cluster[n,c,m]`, where closure/broadcast
 * serialization crosses real JVM boundaries. Prints one PASS/FAIL line per
 * check and a JSON summary; exits nonzero on any mismatch.
 *
 *   spark-submit --master local-cluster[4,2,4096] --class graft.GoldenCheck <jar>
 */
object GoldenCheck {
  def main(args: Array[String]): Unit = {
    val samples =
      if (args.nonEmpty) args(0)
      else "/root/reference/Hecatoncheir/test/samples"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadDs(file: String, gtype: Int) =
      GeoEngine.readWkt(spark, s"$samples/$file", gtype)
    var failures = 0
    def check(name: String)(body: => Boolean): Unit = {
      val ok = try body catch {
        case e: Throwable => System.err.println(s"[$name] ${e.getMessage}"); false
      }
      if (!ok) failures += 1
      println(s"${if (ok) "PASS" else "FAIL"} $name")
    }

    val p1 = loadDs("data_sample_polygons_1.wkt", GeomType.POLYGON)
    val p2 = loadDs("data_sample_polygons_2.wkt", GeomType.POLYGON)
    val ls = loadDs("data_sample_linestrings.wkt", GeomType.LINESTRING)
    val pts = loadDs("data_sample_points.wkt", GeomType.POINT)
    val gridPP = GeoEngine.gridFor(GeoEngine.dataspace(p1, p2))
    val goldenPairs =
      Set((0L, 10L), (1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L))

    check("test1_find_relation") {
      GeoEngine.findRelationJoin(p1, p2, gridPP)
        .groupBy("relation").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap ==
        Map(Topology.TR_INTERSECT -> 4L, Topology.TR_INSIDE -> 1L)
    }
    check("test2_intersection_join") {
      GeoEngine.spatialJoin(p1, p2, Predicates.INTERSECTS, gridPP)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == goldenPairs
    }
    check("test2_april_equivalent") {
      GeoEngine.spatialJoin(p1, p2, Predicates.INTERSECTS, gridPP,
        useApril = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == goldenPairs
    }
    check("find_relation_april_equivalent") {
      def rels(useApril: Boolean) =
        GeoEngine.findRelationJoin(p1, p2, gridPP, useApril)
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      rels(useApril = true) == rels(useApril = false)
    }
    check("test3_poly_x_lines_empty") {
      val g = GeoEngine.gridFor(GeoEngine.dataspace(p1, ls))
      GeoEngine.spatialJoin(p1, ls, Predicates.INTERSECTS, g).count() == 0
    }
    check("test4_knn") {
      val queries =
        GeoEngine.loadQueriesWkt(s"$samples/query_sample_points.wkt", GeomType.POINT)
      val res = GeoEngine.knnBatch(pts, queries, 2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
        .groupBy(_._1).map { case (q, rows) => q -> rows.sortBy(_._3).map(_._2).toSeq }
      res(0L) == Seq(33L, 31L) && res(1L) == Seq(53L, 58L)
    }
    check("test5_range_count") {
      val g = GeoEngine.gridFor(GeoEngine.dataspace(pts))
      val queries =
        GeoEngine.loadQueriesWkt(s"$samples/query_sample_polygons.wkt", GeomType.POLYGON)
      val counts = GeoEngine.rangeBatch(pts, queries, g)
        .groupBy("qid").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      counts.getOrElse(0L, 0L) == 0L && counts.getOrElse(1L, 0L) == 1L
    }
    check("test6_range_collect_empty") {
      val g = GeoEngine.gridFor(GeoEngine.dataspace(p2))
      val queries =
        GeoEngine.loadQueriesWkt(s"$samples/query_sample_polygons.wkt", GeomType.POLYGON)
      GeoEngine.rangeBatch(p2, queries, g).count() == 0
    }
    check("test7_distance_join") {
      val qp = loadDs("query_sample_points.wkt", GeomType.POINT)
      val g = GeoEngine.gridFor(GeoEngine.dataspace(pts, qp))
      GeoEngine.distanceJoin(pts, qp, 7.65, g).count() == 5
    }

    println(s"""{"metric":"golden_check","checks":9,"failures":$failures,""" +
      s""""master":"${spark.sparkContext.master}"}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
