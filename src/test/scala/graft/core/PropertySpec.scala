package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/**
 * Property tests for the load-bearing kernel invariants (SURVEY.md §5.3):
 *  - reference-point dedup ≡ exactly-once pair generation
 *  - APRIL verdicts never contradict exact predicates
 *  - Hilbert bijection
 *  - PiP vs independent winding-number oracle
 *  - kNN engine order ≡ brute-force top-k
 */
class PropertySpec extends AnyFunSuite {

  private def rndPolygon(rnd: Random, cx: Double, cy: Double, r: Double): Geom = {
    // random star-shaped polygon around (cx, cy) — always simple/valid
    val n = 3 + rnd.nextInt(7)
    val pts = (0 until n).map { i =>
      val ang = 2 * math.Pi * i / n
      val rad = r * (0.4 + 0.6 * rnd.nextDouble())
      (cx + rad * math.cos(ang), cy + rad * math.sin(ang))
    }
    Geom.polygon(pts.flatMap(p => Seq(p._1, p._2)).toArray)
  }

  test("ref-point dedup: each intersecting pair counted exactly once across tiles") {
    val rnd = new Random(42)
    val grid = GridConfig.fromDataBounds(0, 0, 50, 50, coarsePpd = 5, globalPpd = 40)
    val polys = (0 until 120).map { i =>
      (i.toLong, rndPolygon(rnd, 1 + rnd.nextDouble() * 48, 1 + rnd.nextDouble() * 48, 1.5))
    }
    val (r, s) = polys.splitAt(60)
    // naive truth
    val naive = (for {
      (ri, rg) <- r; (si, sg) <- s
      if rg.mbr.intersects(sg.mbr) && Topology.intersects(rg, sg)
    } yield (ri, si)).toSet
    // tile path with dedup — count multiplicity
    val byTile = s.flatMap { case (id, g) => grid.fineTiles(g.mbr).map(t => (t, id, g)) }
      .groupBy(_._1)
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for {
      (ri, rg) <- r
      t <- grid.fineTiles(rg.mbr)
      (_, si, sg) <- byTile.getOrElse(t, Seq())
      if rg.mbr.intersects(sg.mbr)
      if grid.refPointTile(rg.mbr, sg.mbr) == t
      if Topology.intersects(rg, sg)
    } emitted += ((ri, si))
    assert(emitted.size == emitted.toSet.size, "duplicate pairs emitted")
    assert(emitted.toSet == naive, "tile path disagrees with naive join")
  }

  test("APRIL verdicts are sound vs exact predicates (1000 random pairs)") {
    val rnd = new Random(7)
    val g = GridConfig.fromDataBounds(0, 0, 10, 10)
    var hits = 0; var negs = 0; var inconclusive = 0
    for (_ <- 0 until 1000) {
      val a = rndPolygon(rnd, 2 + rnd.nextDouble() * 6, 2 + rnd.nextDouble() * 6, 1.0)
      val b = rndPolygon(rnd, 2 + rnd.nextDouble() * 6, 2 + rnd.nextDouble() * 6, 1.0)
      val aa = April.rasterize(a, g.xMin, g.yMin, g.xExtent, g.yExtent, 10)
      val bb = April.rasterize(b, g.xMin, g.yMin, g.xExtent, g.yExtent, 10)
      for (pred <- Seq(Predicates.INTERSECTS, Predicates.DISJOINT, Predicates.INSIDE,
                       Predicates.CONTAINS, Predicates.MEET, Predicates.EQUAL)) {
        val v = April.verdict(pred, aa, bb)
        val exact = Topology.evalPredicate(pred, a, b)
        if (v == April.TRUE_HIT) { assert(exact, s"APRIL HIT but exact false for ${Predicates.name(pred)}"); hits += 1 }
        if (v == April.TRUE_NEGATIVE) { assert(!exact, s"APRIL NEG but exact true for ${Predicates.name(pred)}"); negs += 1 }
        if (v == April.INCONCLUSIVE) inconclusive += 1
      }
    }
    // the filter must actually resolve most decisions, not punt everything
    assert(hits + negs > inconclusive, s"APRIL too weak: hits=$hits negs=$negs inc=$inconclusive")
  }

  test("Hilbert rectIntervals ≡ enumerate-and-merge (exhaustive small, random large)") {
    def enumerated(n: Long, x0: Long, y0: Long, x1: Long, y1: Long): List[Long] = {
      val cells = for { y <- y0 to y1; x <- x0 to x1 } yield Hilbert.xy2d(n, x, y)
      April.cellsToIntervals(cells).toList
    }
    // exhaustive: every rect of every grid up to 16×16
    for (order <- 1 to 4; n = 1L << order;
         x0 <- 0L until n; x1 <- x0 until n;
         y0 <- 0L until n; y1 <- y0 until n) {
      val got = Hilbert.rectIntervals(n, x0, y0, x1, y1).toList
      assert(got == enumerated(n, x0, y0, x1, y1),
        s"order=$order rect=($x0,$y0)-($x1,$y1)")
    }
    // random rects at orders 8 and 10
    val rnd = new Random(7)
    for (order <- Seq(8, 10); _ <- 1 to 60) {
      val n = 1L << order
      val x0 = rnd.nextInt(n.toInt).toLong; val y0 = rnd.nextInt(n.toInt).toLong
      val x1 = math.min(n - 1, x0 + rnd.nextInt(40))
      val y1 = math.min(n - 1, y0 + rnd.nextInt(40))
      assert(Hilbert.rectIntervals(n, x0, y0, x1, y1).toList ==
        enumerated(n, x0, y0, x1, y1), s"order=$order ($x0,$y0)-($x1,$y1)")
    }
    // degenerate: empty and single cell
    assert(Hilbert.rectIntervals(16, 3, 3, 2, 3).isEmpty)
    assert(Hilbert.rectIntervals(16, 5, 7, 5, 7).toList ==
      List(Hilbert.xy2d(16, 5, 7), Hilbert.xy2d(16, 5, 7) + 1))
  }

  test("BOX closed-form rasterization ≡ generic polygon path on the same ring") {
    val rnd = new Random(11)
    val (xMin, yMin, xExt, yExt) = (-180.0, -90.0, 360.0, 180.0)
    for (order <- Seq(6, 10, 16); _ <- 1 to 40) {
      val cx = -170 + rnd.nextDouble() * 340
      val cy = -80 + rnd.nextDouble() * 160
      // keep the order-16 oracle side tractable (it enumerates every cell)
      val cap = if (order >= 16) 0.2 else 8.0
      val hw = rnd.nextDouble() * cap + 1e-4
      val hh = rnd.nextDouble() * cap * 0.75 + 1e-4
      val ring = Array(cx - hw, cy - hh, cx + hw, cy - hh, cx + hw, cy + hh,
        cx - hw, cy + hh, cx - hw, cy - hh)
      val asBox = April.rasterize(Geom(GeomType.BOX, ring),
        xMin, yMin, xExt, yExt, order)
      val asPoly = April.rasterize(Geom(GeomType.POLYGON, ring),
        xMin, yMin, xExt, yExt, order)
      assert(asBox.all.toList == asPoly.all.toList,
        s"ALL differs order=$order box=($cx,$cy,$hw,$hh)")
      assert(asBox.full.toList == asPoly.full.toList,
        s"FULL differs order=$order box=($cx,$cy,$hw,$hh)")
    }
  }

  test("Hilbert xy2d/d2xy bijection at order 16 (sampled)") {
    val n = 1L << 16
    val rnd = new Random(3)
    for (_ <- 0 until 20000) {
      val x = (rnd.nextDouble() * n).toLong
      val y = (rnd.nextDouble() * n).toLong
      val d = Hilbert.xy2d(n, x, y)
      assert(d >= 0 && d < n * n)
      val (x2, y2) = Hilbert.d2xy(n, d)
      assert(x2 == x && y2 == y)
    }
  }

  test("point-in-polygon agrees with winding-number oracle") {
    val rnd = new Random(11)
    def winding(px: Double, py: Double, ring: Array[Double]): Boolean = {
      var wn = 0
      var i = 0
      while (i + 3 < ring.length) {
        val x1 = ring(i); val y1 = ring(i + 1); val x2 = ring(i + 2); val y2 = ring(i + 3)
        if (y1 <= py) {
          if (y2 > py && ((x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)) > 0) wn += 1
        } else {
          if (y2 <= py && ((x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)) < 0) wn -= 1
        }
        i += 2
      }
      wn != 0
    }
    for (_ <- 0 until 2000) {
      val poly = rndPolygon(rnd, 5, 5, 3)
      val px = rnd.nextDouble() * 10; val py = rnd.nextDouble() * 10
      val loc = Topology.locate(px, py, poly)
      if (loc != 1) { // skip boundary (winding undefined there)
        assert((loc == 0) == winding(px, py, poly.coords),
          s"PiP mismatch at ($px,$py) for ${Wkt.write(poly)}")
      }
    }
  }

  test("two-layer class assignment partitions the cover (A/B/C/D consistent)") {
    val rnd = new Random(5)
    val grid = GridConfig.fromDataBounds(0, 0, 100, 100)
    for (_ <- 0 until 2000) {
      val x = rnd.nextDouble() * 95; val y = rnd.nextDouble() * 95
      val m = MBR(x, y, x + rnd.nextDouble() * 4, y + rnd.nextDouble() * 4)
      val packed = grid.fineTilesWithClass(m)
      val classes = packed.map(p => (p & 3L).toInt)
      assert(classes.count(_ == TwoLayerClass.A) == 1, "exactly one class-A tile")
      val tiles = packed.map(_ >>> 2)
      assert(tiles.toSet == grid.fineTiles(m).toSet)
    }
  }
}
