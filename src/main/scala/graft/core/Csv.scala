package graft.core

/**
 * Headerless-CSV geometry parsing with the reference's load semantics
 * (/root/reference/Hecatoncheir/src/env/partitioning.cpp:117-354):
 * each data line is `id,x y,x y,...`; the file's id column is read but
 * IGNORED (`object.recID = currentLine`, partitioning.cpp:270) — record ids
 * come from line position. The first file line holds the declared object
 * count. Note the reference's own CSV shipping path is unfinished
 * (DBERR_FEATURE_UNSUPPORTED, partitioning.cpp:316); we implement the
 * declared parse/count semantics.
 */
object Csv {

  /** Parse one `id,x y,x y,...` data line into a Geom of the declared type.
    * Malformed lines or vertex counts that don't fit the type → None
    * (skipped, like the WKT loader's per-row rejection). */
  def parseLine(line: String, gtype: Int): Option[Geom] = {
    val parts = line.split(',')
    if (parts.length < 2) return None
    val coords = new Array[Double](2 * (parts.length - 1))
    var i = 1
    while (i < parts.length) {
      val t = parts(i).trim
      val sp = t.indexOf(' ')
      if (sp <= 0 || sp >= t.length - 1) return None
      try {
        coords(2 * (i - 1)) = t.substring(0, sp).toDouble
        coords(2 * (i - 1) + 1) = t.substring(sp + 1).trim.toDouble
      } catch { case _: NumberFormatException => return None }
      i += 1
    }
    gtype match {
      case GeomType.POINT =>
        if (coords.length == 2) Some(Geom(GeomType.POINT, coords)) else None
      case GeomType.LINESTRING =>
        if (coords.length >= 4) Some(Geom(GeomType.LINESTRING, coords)) else None
      case GeomType.POLYGON =>
        // ring must close; reference "corrects" geometry — close it if open
        if (coords.length < 6) None
        else {
          val n = coords.length
          val closed =
            coords(0) == coords(n - 2) && coords(1) == coords(n - 1)
          val ring = if (closed) coords else coords ++ Array(coords(0), coords(1))
          if (ring.length >= 8) Some(Geom(GeomType.POLYGON, ring)) else None
        }
      case _ => None
    }
  }
}
