package graft.core

/**
 * Geometry model for the engine's pure (non-Spark) kernel layer.
 *
 * Mirrors the reference's data model (4 geometry types, flat coordinate
 * storage, MBR per record — see /root/reference/Hecatoncheir/include/def.h:151-157
 * and containers.h:1230-1548) but is laid out for Tungsten friendliness:
 * a geometry is `(gtype: Int, coords: Array[Double])` with coords packed as
 * x0,y0,x1,y1,... — never a JVM object graph.
 *
 * Polygons are single-ring (the reference rejects MULTI / EMPTY / holes on load,
 * containers.h:956-968); the ring is stored closed (first point == last point).
 */
object GeomType {
  val POINT = 0
  val LINESTRING = 1
  val BOX = 2
  val POLYGON = 3
  def name(t: Int): String = t match {
    case POINT => "POINT"
    case LINESTRING => "LINESTRING"
    case BOX => "BOX"
    case POLYGON => "POLYGON"
    case _ => s"UNKNOWN($t)"
  }
}

/** Minimum bounding rectangle. */
final case class MBR(xmin: Double, ymin: Double, xmax: Double, ymax: Double) {
  def intersects(o: MBR): Boolean =
    !(xmax < o.xmin || xmin > o.xmax || ymax < o.ymin || ymin > o.ymax)
  def contains(x: Double, y: Double): Boolean =
    x >= xmin && x <= xmax && y >= ymin && y <= ymax
  def expand(d: Double): MBR = MBR(xmin - d, ymin - d, xmax + d, ymax + d)
  def union(o: MBR): MBR =
    MBR(math.min(xmin, o.xmin), math.min(ymin, o.ymin),
        math.max(xmax, o.xmax), math.max(ymax, o.ymax))
}

object MBR {
  val empty: MBR = MBR(Double.MaxValue, Double.MaxValue, -Double.MaxValue, -Double.MaxValue)
  def ofCoords(coords: Array[Double]): MBR = {
    var xmin = Double.MaxValue; var ymin = Double.MaxValue
    var xmax = -Double.MaxValue; var ymax = -Double.MaxValue
    var i = 0
    while (i < coords.length) {
      val x = coords(i); val y = coords(i + 1)
      if (x < xmin) xmin = x
      if (x > xmax) xmax = x
      if (y < ymin) ymin = y
      if (y > ymax) ymax = y
      i += 2
    }
    MBR(xmin, ymin, xmax, ymax)
  }
}

/** A parsed geometry: type + packed coords (+ cached MBR). */
final case class Geom(gtype: Int, coords: Array[Double]) {
  lazy val mbr: MBR = MBR.ofCoords(coords)
  def numPoints: Int = coords.length / 2
  def x(i: Int): Double = coords(2 * i)
  def y(i: Int): Double = coords(2 * i + 1)
  def isPoint: Boolean = gtype == GeomType.POINT
  def isLine: Boolean = gtype == GeomType.LINESTRING
  def isAreal: Boolean = gtype == GeomType.POLYGON || gtype == GeomType.BOX

  /** Signed ring area ×2 (shoelace); >0 for CCW rings. Areal geometries only. */
  def signedArea2: Double = {
    var s = 0.0
    var i = 0
    val n = numPoints - 1 // ring is closed; skip duplicated last point
    while (i < n) {
      val j = i + 1
      s += x(i) * y(j) - x(j) * y(i)
      i += 1
    }
    s
  }
}

object Geom {
  def point(px: Double, py: Double): Geom = Geom(GeomType.POINT, Array(px, py))

  def box(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Geom =
    Geom(GeomType.BOX, Array(xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax, xmin, ymin))

  /** Build a polygon from coords, closing the ring if open. */
  def polygon(coords: Array[Double]): Geom = {
    val n = coords.length
    val closed =
      if (n >= 4 && coords(0) == coords(n - 2) && coords(1) == coords(n - 1)) coords
      else coords ++ Array(coords(0), coords(1))
    Geom(GeomType.POLYGON, closed)
  }

  def linestring(coords: Array[Double]): Geom = Geom(GeomType.LINESTRING, coords)
}
