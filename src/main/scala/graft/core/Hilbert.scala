package graft.core

/**
 * Hilbert curve xy↔d mapping — the classic iterative quadrant-rotation
 * algorithm (as popularized on the Hilbert-curve Wikipedia page; the
 * reference uses the same public algorithm at
 * /root/reference/Hecatoncheir/src/utils.cpp:8-44).
 *
 * `n` is the grid size per dimension (a power of two, e.g. 2^16). The
 * reference stores d in uint32; for n = 2^16 the max d = 2^32 - 1, so we
 * compute in Long and expose Long to avoid JVM signed-Int pitfalls.
 */
object Hilbert {

  /** Map grid cell (x, y) in an n×n grid to its Hilbert distance. */
  def xy2d(n: Long, xIn: Long, yIn: Long): Long = {
    var x = xIn; var y = yIn
    var d = 0L
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /**
   * Sorted minimal [start, end) Hilbert interval list covering the inclusive
   * cell rectangle [x0..x1]×[y0..y1] of an n×n grid — direct quadtree
   * decomposition in curve order, O(output) instead of enumerating (and
   * sorting) every covered cell. A w×h rectangle yields O(w+h) intervals,
   * so rasterizing a 1820×2912-cell box at order 16 emits a few thousand
   * interval bounds instead of touching 5.3M cells.
   *
   * Produces the same minimal interval list as
   * `April.cellsToIntervals(all cells' xy2d)` — equivalence property-tested
   * exhaustively at small orders and randomly at large ones.
   */
  def rectIntervals(n: Long, x0: Long, y0: Long, x1: Long, y1: Long): Array[Long] = {
    if (x1 < x0 || y1 < y0) return Array.emptyLongArray
    val out = new scala.collection.mutable.ArrayBuffer[Long](32)
    @inline def emit(a: Long, b: Long): Unit =
      if (out.nonEmpty && out(out.length - 1) == a) out(out.length - 1) = b
      else { out += a; out += b }
    // quadrants visited in curve (d) order; child coords per xy2d's
    // per-level transform expressed in quadrant-local coordinates:
    //   ry==0, rx==0:  (x', y') = (y, x)
    //   ry==0, rx==1:  (x', y') = (s-1-y, s-1-x)
    //   ry==1:         identity
    def rec(sz: Long, ax0: Long, ay0: Long, ax1: Long, ay1: Long, dBase: Long): Unit = {
      if (ax0 == 0 && ay0 == 0 && ax1 == sz - 1 && ay1 == sz - 1) {
        emit(dBase, dBase + sz * sz); return
      }
      val s = sz / 2
      var q = 0
      while (q < 4) {
        val rx = if (q >= 2) 1L else 0L
        val ry = if (q == 1 || q == 2) 1L else 0L
        val qx0 = math.max(ax0, rx * s) - rx * s
        val qx1 = math.min(ax1, rx * s + s - 1) - rx * s
        val qy0 = math.max(ay0, ry * s) - ry * s
        val qy1 = math.min(ay1, ry * s + s - 1) - ry * s
        if (qx0 <= qx1 && qy0 <= qy1) {
          val (bx0, by0, bx1, by1) =
            if (ry == 0) {
              if (rx == 1) (s - 1 - qy1, s - 1 - qx1, s - 1 - qy0, s - 1 - qx0)
              else (qy0, qx0, qy1, qx1)
            } else (qx0, qy0, qx1, qy1)
          rec(s, bx0, by0, bx1, by1, dBase + s * s * ((3 * rx) ^ ry))
        }
        q += 1
      }
    }
    rec(n, x0, y0, x1, y1, 0L)
    out.toArray
  }

  /** Inverse: Hilbert distance d to (x, y) in an n×n grid. */
  def d2xy(n: Long, d: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = d
    var s = 1L
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }
}
