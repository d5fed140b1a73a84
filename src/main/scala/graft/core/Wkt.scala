package graft.core

/**
 * WKT parser with the reference's acceptance/rejection semantics
 * (/root/reference/Hecatoncheir/include/containers.h:956-1005 and
 * src/env/partitioning.cpp:512-531): a record is loaded only when the WKT's
 * geometry tag matches the dataset's declared type; EMPTY and MULTI* are
 * rejected; rejected rows are skipped but still consume their line number
 * (recID = 0-based line number, partitioning.cpp:526).
 *
 * This is a fresh recursive-descent-free scanner (the reference hand-rolls
 * strchr/atof loops); we use indexOf + java.lang.Double.parseDouble which has
 * identical double semantics for the plain decimal literals in WKT files.
 */
object Wkt {

  /** Parse WKT text expecting the declared type. Returns None when the row
    * must be skipped per reference semantics (wrong tag, EMPTY, MULTI*,
    * malformed, or invalid geometry). */
  def parse(wkt: String, expected: Int): Option[Geom] = {
    val s = wkt.trim
    if (s.isEmpty || s.contains("EMPTY") || s.contains("MULTI")) return None
    val tag = expected match {
      case GeomType.POINT => "POINT"
      case GeomType.LINESTRING => "LINESTRING"
      case GeomType.BOX => "BOX"
      case GeomType.POLYGON => "POLYGON"
      case _ => return None
    }
    if (!s.startsWith(tag)) return None
    // guard against e.g. expected POINT matching "POINTZ" or LINESTRING prefix
    val rest = s.substring(tag.length).dropWhile(_ == ' ')
    if (rest.isEmpty || rest.charAt(0) != '(') return None
    val coords = parseCoords(rest)
    if (coords == null || coords.isEmpty) return None
    expected match {
      case GeomType.POINT =>
        if (coords.length != 2) None else Some(Geom(GeomType.POINT, coords))
      case GeomType.LINESTRING =>
        if (coords.length < 4) None else Some(Geom(GeomType.LINESTRING, coords))
      case GeomType.POLYGON | GeomType.BOX =>
        if (coords.length < 6) None
        else {
          val g = Geom.polygon(coords)
          // reference rejects invalid (zero-area / degenerate) rings via
          // boost::geometry::is_valid after correct(); we apply the cheap
          // subset that matters for well-formed inputs.
          if (math.abs(g.signedArea2) == 0.0) None else Some(g)
        }
      case _ => None
    }
  }

  /** Extract all numbers inside the (possibly nested) parens as x,y pairs. */
  private def parseCoords(s: String): Array[Double] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Double](16)
    val n = s.length
    var k = 0
    while (k < n) {
      val c = s.charAt(k)
      if (c == '-' || (c >= '0' && c <= '9')) {
        var j = k + 1
        while (j < n && isNumChar(s.charAt(j), s.charAt(j - 1))) j += 1
        try buf += java.lang.Double.parseDouble(s.substring(k, j))
        catch { case _: NumberFormatException => return null }
        k = j
      } else k += 1
    }
    if (buf.length % 2 != 0) return null
    buf.toArray
  }

  private def isNumChar(c: Char, prev: Char): Boolean =
    (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' ||
      ((c == '-' || c == '+') && (prev == 'e' || prev == 'E'))

  /** Serialize a geometry back to WKT (round-trip/testing aid). */
  def write(g: Geom): String = {
    val sb = new StringBuilder(GeomType.name(g.gtype))
    g.gtype match {
      case GeomType.POINT =>
        sb.append(" (").append(g.coords(0)).append(' ').append(g.coords(1)).append(')')
      case GeomType.LINESTRING =>
        sb.append(" (")
        appendPairs(sb, g.coords); sb.append(')')
      case _ =>
        sb.append(" ((")
        appendPairs(sb, g.coords); sb.append("))")
    }
    sb.toString
  }

  private def appendPairs(sb: StringBuilder, cs: Array[Double]): Unit = {
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(',')
      sb.append(cs(i)).append(' ').append(cs(i + 1))
      i += 2
    }
  }
}
