package graft

/**
 * Engine row types. Geometry is packed coords (never object graphs) so
 * Encoders keep rows unboxed in Tungsten format; the MBR is flattened to
 * four top-level doubles so Catalyst can push tile/MBR math into codegen
 * and parquet min/max pruning.
 */
final case class GeoRow(
    id: Long,
    gtype: Int,
    coords: Array[Double],
    xmin: Double, ymin: Double, xmax: Double, ymax: Double)

object GeoRow {
  def of(id: Long, g: graft.core.Geom): GeoRow = {
    val m = g.mbr
    GeoRow(id, g.gtype, g.coords, m.xmin, m.ymin, m.xmax, m.ymax)
  }
}

/** A tile assignment for one record: reference-exact fine-grid tile plus the
  * H3-style hierarchical hex cell (see [[graft.core.HexGrid]]). */
final case class TileAssignment(
    id: Long,
    tile: Long,        // reference-exact fine grid tile id (x-major)
    coarseTile: Long,  // distribution-grid tile (shuffle/partition key)
    clazz: Int,        // two-layer class A=0 B=1 C=2 D=3
    hexCell: Long)     // H3-style cell id at the engine's configured res

/** Dataspace metadata (computed once per dataset pair, broadcast). */
final case class Dataspace(xmin: Double, ymin: Double, xmax: Double, ymax: Double)
