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
