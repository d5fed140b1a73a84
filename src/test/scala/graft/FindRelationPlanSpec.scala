package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/**
 * APRIL sub-plan pruning in findRelationJoin: on an all-rectangular
 * workload the column fast path is exact, so useApril=true must compile to
 * the SAME plan as useApril=false — no rasterize, no interval re-join.
 * On non-rectangular inputs the topology filter must still run (and agree
 * with the exact path), with all-point sides synthesizing their A-list
 * inline instead of rasterizing.
 */
class FindRelationPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val grid = graft.web.Pages.WorldGrid

  private def boxes(seed: Int, n: Int): org.apache.spark.sql.Dataset[GeoRow] = {
    import spark.implicits._
    (0 until n).map { i =>
      val k = i * 31 + seed
      val cx = (k * 13 % 2800) / 8.0 - 175.0
      val cy = (k * 17 % 1280) / 8.0 - 80.0
      val hw = ((k % 40) + 2) / 8.0
      val hh = ((k % 30) + 2) / 8.0
      GeoRow(i.toLong, GeomType.BOX,
        Array(cx - hw, cy - hh, cx + hw, cy - hh, cx + hw, cy + hh,
          cx - hw, cy + hh, cx - hw, cy - hh),
        cx - hw, cy - hh, cx + hw, cy + hh)
    }.toDS()
  }

  private def points(seed: Int, n: Int): org.apache.spark.sql.Dataset[GeoRow] = {
    import spark.implicits._
    (0 until n).map { i =>
      val k = i * 7 + seed
      val x = (k % 2880) / 8.0 - 180.0
      val y = (k * 11 % 1360) / 8.0 - 85.0
      GeoRow(i.toLong, GeomType.POINT, Array(x, y), x, y, x, y)
    }.toDS()
  }

  private def diamonds(seed: Int, n: Int): org.apache.spark.sql.Dataset[GeoRow] = {
    import spark.implicits._
    (0 until n).map { i =>
      val k = i * 13 + seed
      val cx = (k % 2800) / 8.0 - 175.0
      val cy = (k * 17 % 1280) / 8.0 - 80.0
      val hw = ((k % 40) + 2) / 8.0
      val hh = ((k % 30) + 2) / 8.0
      GeoRow(i.toLong, GeomType.POLYGON,
        Array(cx - hw, cy, cx, cy - hh, cx + hw, cy, cx, cy + hh, cx - hw, cy),
        cx - hw, cy - hh, cx + hw, cy + hh)
    }.toDS()
  }

  test("all-box find-relation with useApril=true prunes the APRIL sub-plan") {
    val df = GeoEngine.findRelationJoin(boxes(0, 300), boxes(7, 300), grid,
      useApril = true)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("april_rasterize"), "rasterize survived the prune")
    assert(!plan.contains("april_topo_rel"), "interval filter survived the prune")
    val noApril = GeoEngine.findRelationJoin(boxes(0, 300), boxes(7, 300), grid)
    val a = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = noApril.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
  }

  test("points × diamonds: APRIL topology filter agrees with the exact path") {
    val withApril = GeoEngine.findRelationJoin(points(0, 1500), diamonds(3, 200),
      grid, useApril = true, aprilOrder = 10)
    // the point side must synthesize its A-list inline, not rasterize
    val plan = withApril.queryExecution.optimizedPlan.toString
    assert(plan.contains("april_topo_rel"), "topology filter missing from plan")
    assert(plan.contains("hilbert_cell"), "point A-list not synthesized inline")
    val exact = GeoEngine.findRelationJoin(points(0, 1500), diamonds(3, 200), grid)
    val a = withApril.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
    // the relation alphabet for point-in-diamond: INSIDE / COVERED_BY / DISJOINT
    val rels = a.map(_._3)
    assert(rels.subsetOf(Set(Topology.TR_INSIDE, Topology.TR_COVERED_BY,
      Topology.TR_DISJOINT)))
    assert(rels.contains(Topology.TR_INSIDE))
    assert(rels.contains(Topology.TR_DISJOINT))
  }
}
