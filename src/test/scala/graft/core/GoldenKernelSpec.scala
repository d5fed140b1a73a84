package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference's own 7 golden query results
 * (/root/reference/Hecatoncheir/test/classes/QueryTest.cpp:7-266), verified
 * here with brute-force evaluation over the pure kernels — no Spark, no
 * tiling. The Spark engine path is asserted to match these in
 * GoldenEngineSpec; together they pin both the kernels and the
 * tile-join/dedup machinery.
 */
class GoldenKernelSpec extends AnyFunSuite {

  test("node assignment parity: rank = (coarseTile % workers) + 1 (containers.h:1759)") {
    val g = GridConfig.fromDataBounds(-180, -90, 180, 90)
    for (tile <- Seq(0L, 1L, 108L, 109L, 5000L, 11880L); workers <- Seq(1, 4, 10))
      assert(g.nodeRankForCoarse(tile, workers) == (tile % workers) + 1)
  }

  private val samples = "/root/reference/Hecatoncheir/test/samples"

  def load(file: String, gtype: Int): Seq[(Long, Geom)] = {
    // reference semantics: totalObjects = newline count (`wc -l`), so a final
    // unterminated line is never loaded (partitioning.cpp:489 + read.cpp:205)
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$samples/$file")))
    val nl = content.count(_ == '\n')
    val lines = content.split("\n", -1).take(nl)
    lines.zipWithIndex.toSeq.flatMap { case (line, i) =>
      val wkt = line.split('\t')(0)
      Wkt.parse(wkt, gtype).map(g => (i.toLong, g))
    }
  }

  lazy val polys1 = load("data_sample_polygons_1.wkt", GeomType.POLYGON)
  lazy val polys2 = load("data_sample_polygons_2.wkt", GeomType.POLYGON)
  lazy val lines10 = load("data_sample_linestrings.wkt", GeomType.LINESTRING)
  lazy val points100 = load("data_sample_points.wkt", GeomType.POINT)
  /** Query files are read with plain getline-until-EOF (keeps an unterminated
    * final line) — API/Hecatoncheir.cpp:799. */
  def loadQueries(file: String, gtype: Int): Seq[(Long, Geom)] =
    scala.io.Source.fromFile(s"$samples/$file").getLines().toSeq.zipWithIndex
      .flatMap { case (line, i) =>
        Wkt.parse(line.split('\t')(0), gtype).map(g => (i.toLong, g))
      }

  lazy val queryPts = loadQueries("query_sample_points.wkt", GeomType.POINT)
  lazy val queryPolys = loadQueries("query_sample_polygons.wkt", GeomType.POLYGON)

  test("fixtures load with reference acceptance rules") {
    assert(polys1.size == 19)
    assert(polys2.size == 11)
    assert(lines10.size == 10)
    assert(points100.size == 100)
    assert(queryPts.size == 2)
    assert(queryPolys.size == 2)
  }

  test("test1: find-relation join polygons1 x polygons2 = {INTERSECT:4, INSIDE:1}") {
    val counts = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    for ((_, r) <- polys1; (_, s) <- polys2 if r.mbr.intersects(s.mbr)) {
      val rel = Topology.findRelation(r, s)
      counts(rel) += 1
    }
    assert(counts(Topology.TR_INTERSECT) == 4, s"got $counts")
    assert(counts(Topology.TR_INSIDE) == 1, s"got $counts")
    assert(counts(Topology.TR_DISJOINT) + counts(Topology.TR_CONTAINS) +
      counts(Topology.TR_COVERED_BY) + counts(Topology.TR_COVERS) +
      counts(Topology.TR_EQUAL) + counts(Topology.TR_MEET) ==
      counts.values.sum - 5, s"got $counts")
  }

  test("test2: intersection join polygons1 x polygons2 = 5 pairs") {
    val pairs = for {
      (ri, r) <- polys1; (si, s) <- polys2
      if r.mbr.intersects(s.mbr) && Topology.intersects(r, s)
    } yield (ri, si)
    assert(pairs.size == 5, s"got ${pairs.size}: $pairs")
  }

  test("test3: intersection join polygons1 x linestrings = 0 pairs") {
    val pairs = for {
      (ri, r) <- polys1; (si, s) <- lines10
      if r.mbr.intersects(s.mbr) && Topology.intersects(r, s)
    } yield (ri, si)
    assert(pairs.isEmpty, s"got $pairs")
  }

  test("test4: kNN k=2 goldens [33,31] and [53,58] in ascending distance order") {
    def knn(q: Geom, k: Int): Seq[Long] =
      points100.map { case (id, p) => (Topology.distance(q, p), id) }
        .sortBy(t => (t._1, t._2)).take(k).map(_._2)
    assert(knn(queryPts(0)._2, 2) == Seq(33L, 31L))
    assert(knn(queryPts(1)._2, 2) == Seq(53L, 58L))
  }

  test("test5: range COUNT on points = {q0:0, q1:1}") {
    def rangeCount(w: Geom): Int =
      points100.count { case (_, p) => Topology.intersects(w, p) }
    assert(rangeCount(queryPolys(0)._2) == 0)
    assert(rangeCount(queryPolys(1)._2) == 1)
  }

  test("test6: range COLLECT on polygons2 = {q0:0, q1:0}") {
    def rangeIds(w: Geom): Seq[Long] =
      polys2.collect { case (id, p) if Topology.intersects(w, p) => id }
    assert(rangeIds(queryPolys(0)._2).isEmpty)
    assert(rangeIds(queryPolys(1)._2).isEmpty)
  }

  test("test7: distance join points x query points, d=7.65 = 5 pairs") {
    val pairs = for {
      (ri, r) <- points100; (si, s) <- queryPts
      if Topology.distance(r, s) <= 7.65
    } yield (ri, si)
    assert(pairs.size == 5, s"got ${pairs.size}: $pairs")
  }
}
