package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core._

/**
 * Spark-native spatial engine: the reference's prepare/partition/index/query
 * pipeline re-expressed as lazy DataFrame transformations
 * (SURVEY.md §3.1-3.3). One shuffle per join (the tile repartition); the
 * MBR → APRIL → exact-refinement cascade runs inside the joined stage with
 * no extra exchange.
 *
 * Exactly-once pair generation uses the reference-point filter (equivalent
 * to the reference's two-layer class sweeps, proven by RefPointPropertySpec)
 * so no dropDuplicates shuffle is ever needed.
 */
object GeoEngine {

  // ------------------------------------------------------------------ source

  /**
   * Read a WKT file as Dataset[GeoRow] with reference load semantics:
   * recID = 0-based line number, invalid/mismatched rows skipped but still
   * consuming their line number, and only `newline count` lines loaded
   * (an unterminated final line is dropped) — partitioning.cpp:489-531.
   */
  def readWkt(spark: SparkSession, path: String, gtype: Int): Dataset[GeoRow] = {
    import spark.implicits._
    val totalLines = countNewlines(spark, path)
    // zipWithIndex gives the deterministic global line number (the only RDD
    // use in the engine; Spark has no lazy row-number-in-file primitive).
    spark.read.textFile(path).rdd.zipWithIndex()
      .filter(_._2 < totalLines)
      .flatMap { case (line, idx) =>
        val wkt = line.split('\t')(0)
        Wkt.parse(wkt, gtype).map(g => GeoRow.of(idx, g))
      }.toDS()
  }

  /** Newline count through the Hadoop FileSystem API so the reference's
    * wc-l load cap works for any Spark-readable path (hdfs://, s3a://, ...),
    * not just driver-local files. */
  private def countNewlines(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new java.io.BufferedInputStream(fs.open(p), 1 << 20)
    try {
      var n = 0L; var c = in.read()
      while (c != -1) { if (c == '\n') n += 1; c = in.read() }
      n
    } finally in.close()
  }

  /** Query-file semantics: all lines (incl. unterminated last) — see
    * API/Hecatoncheir.cpp:799. */
  def loadQueriesWkt(path: String, gtype: Int): Seq[(Long, Geom)] =
    scala.io.Source.fromFile(path).getLines().zipWithIndex.flatMap {
      case (line, i) => Wkt.parse(line.split('\t')(0), gtype).map(g => (i.toLong, g))
    }.toSeq

  // -------------------------------------------------------------- dataspace

  /** Global bounds of one or more datasets (one scan each, tiny result). */
  def dataspace(dss: Dataset[GeoRow]*): Dataspace = {
    val bounds = dss.map { ds =>
      val r = ds.agg(min("xmin"), min("ymin"), max("xmax"), max("ymax")).head()
      require(!r.isNullAt(0), "dataspace: empty dataset (no rows to bound)")
      Dataspace(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    bounds.reduce((a, b) => Dataspace(
      math.min(a.xmin, b.xmin), math.min(a.ymin, b.ymin),
      math.max(a.xmax, b.xmax), math.max(a.ymax, b.ymax)))
  }

  def gridFor(ds: Dataspace,
              coarsePpd: Int = GridConfig.DefaultCoarsePpd,
              globalPpd: Int = GridConfig.DefaultGlobalPpd): GridConfig =
    GridConfig.fromDataBounds(ds.xmin, ds.ymin, ds.xmax, ds.ymax, coarsePpd, globalPpd)

  // ----------------------------------------------------------------- tiling

  /** Explode a dataset by its fine-tile cover: adds `tile` (and keeps every
    * original column). Points take the single-tile fast path. */
  def withTiles(ds: Dataset[GeoRow], grid: GridConfig): DataFrame =
    withTiles2(ds.toDF(), grid)

  /** Tile explode for any DataFrame carrying (gtype, xmin, ymin, xmax, ymax).
    * Pure Catalyst expressions (sequence/transform/flatten) — no UDF, the
    * cover generation stays inside whole-stage codegen. */
  def withTiles2(df: DataFrame, grid: GridConfig): DataFrame = {
    def clampI(c: Column, ext: Double, lo: Double): Column =
      least(greatest(floor((c - lit(lo)) / lit(ext)).cast("long"), lit(0L)),
        lit(grid.globalPpd - 1L))
    val iMin = clampI(col("xmin"), grid.fineExtX, grid.xMin)
    val iMax = clampI(col("xmax"), grid.fineExtX, grid.xMin)
    val jMin = clampI(col("ymin"), grid.fineExtY, grid.yMin)
    val jMax = clampI(col("ymax"), grid.fineExtY, grid.yMin)
    val ppd = lit(grid.globalPpd.toLong)
    val cover = flatten(transform(sequence(jMin, jMax),
      j => transform(sequence(iMin, iMax), i => i + j * ppd)))
    val single = array(iMin + jMin * ppd)
    df.withColumn("tile",
      explode(when(col("gtype") === GeomType.POINT, single).otherwise(cover)))
  }

  /**
   * APRIL index build: adds `april_all` / `april_full` interval-list columns,
   * rasterizing each object exactly once (the reference's buildAPRIL,
   * src/containers.cpp:300-334, as lazy columns instead of sidecar files).
   * Persist the result to make the index durable, exactly like the
   * reference's `persist=true` APRIL files.
   */
  def aprilIndex(df: DataFrame, grid: GridConfig, order: Int = AprilOrder): DataFrame = {
    val rastUdf = udf { (gtype: Int, coords: Array[Double]) =>
      val a = April.rasterize(Geom(gtype, coords), grid.xMin, grid.yMin,
        grid.xExtent, grid.yExtent, order)
      (a.all, a.full)
    }
    df.withColumn("_april", rastUdf(col("gtype"), col("coords")))
      .withColumn("april_all", col("_april._1"))
      .withColumn("april_full", col("_april._2"))
      .drop("_april")
  }

  /** Full tile assignment (fine tile + coarse tile + class + hex cell) for
    * point records — the Dataset[TileAssignment] surface of the north rule. */
  def tileAssignments(points: DataFrame, grid: GridConfig, hexRes: Int): Dataset[TileAssignment] = {
    val spark = points.sparkSession
    import spark.implicits._
    // pure column expressions (codegen, no UDF): points sit in exactly one tile
    val fi = floor((col("x") - lit(grid.xMin)) / lit(grid.fineExtX)).cast("long")
    val fj = floor((col("y") - lit(grid.yMin)) / lit(grid.fineExtY)).cast("long")
    val fic = least(greatest(fi, lit(0L)), lit(grid.globalPpd - 1L))
    val fjc = least(greatest(fj, lit(0L)), lit(grid.globalPpd - 1L))
    val hexUdf = udf { (x: Double, y: Double) => HexGrid.latLngToCell(x, y, hexRes) }
    val fpc = grid.finePerCoarse.toDouble
    points.select(
      col("id"),
      (fic + fjc * grid.globalPpd).as("tile"),
      (floor(fic / lit(fpc)).cast("long") +
        floor(fjc / lit(fpc)).cast("long") * grid.coarsePpd).as("coarseTile"),
      lit(TwoLayerClass.A).as("clazz"),
      hexUdf(col("x"), col("y")).as("hexCell")
    ).as[TileAssignment]
  }

  // ------------------------------------------------------------------ joins

  /**
   * Predicate spatial join: returns (rid, sid) pairs satisfying `pred`.
   *
   * Plan: tile-explode both sides → equi-join on tile (Catalyst picks
   * SHJ/SMJ; pass `broadcastS = true` to force a broadcast of S's exploded
   * form) → inclusive MBR-overlap (codegen'd column predicate) →
   * reference-point dedup → optional APRIL verdict → exact refinement for
   * inconclusive pairs only.
   *
   * Disjoint-join caveat intentionally preserved: candidates still come from
   * common tiles only (SURVEY.md §2.4).
   */
  def spatialJoin(r: Dataset[GeoRow], s: Dataset[GeoRow], pred: Int,
                  grid: GridConfig, useApril: Boolean = false,
                  broadcastS: Boolean = false,
                  saltFactor: Int = 1,
                  aprilOrder: Int = AprilOrder): DataFrame = {
    def ix(df: DataFrame): DataFrame =
      if (!useApril) df
      else if (df.columns.contains("april_all")) df // pre-indexed (buildIndex)
      else aprilIndex(df, grid, aprilOrder)
    val rIx = ix(r.toDF())
    val sIx = ix(s.toDF())
    // In broadcast mode the build side ships whole (one pass, no shuffle), so
    // payload columns ride along. In shuffle mode only (tile, id, mbr) go
    // through the exchange; geometry/APRIL columns re-join by id afterwards
    // (carrying arrays through a many-tiles explode multiplies shuffle bytes).
    val slim = !broadcastS
    def payloadCols(p: String): Seq[Column] = {
      val geom = Seq(col("gtype").as(p + "g"), col("coords").as(p + "c"))
      val april =
        if (useApril) Seq(col("april_all").as(p + "_april_all"),
          col("april_full").as(p + "_april_full"))
        else Nil
      geom ++ april
    }
    def side(df: DataFrame, p: String, idName: String): DataFrame = {
      val base = Seq(col("tile"), col("id").as(idName),
        col("xmin").as(p + "xmin"), col("ymin").as(p + "ymin"),
        col("xmax").as(p + "xmax"), col("ymax").as(p + "ymax"))
      val cols = if (slim) base else base ++ payloadCols(p)
      withTiles2(df, grid).select(cols: _*)
    }
    def geomTable(df: DataFrame, p: String, idName: String): DataFrame =
      df.select((col("id").as(idName) +: payloadCols(p)): _*)
    val rt0 = side(rIx, "r", "rid")
    var st0 = side(sIx, "s", "sid")
    // hot-tile salting (shuffle joins only): probe side takes a stable salt
    // from its id, build side replicates saltFactor ways — a hot tile's rows
    // spread over saltFactor shuffle partitions. AQE skew-split handles the
    // moderate case; explicit salting is for the 10^12-row hot-spot regime.
    val salted = saltFactor > 1 && !broadcastS
    val rt = if (salted)
      rt0.withColumn("salt", pmod(hash(col("rid")), lit(saltFactor))) else rt0
    if (salted)
      st0 = st0.withColumn("salt",
        explode(sequence(lit(0), lit(saltFactor - 1))))
    val st = if (broadcastS) broadcast(st0) else st0
    val joinKeys = if (salted) Seq("tile", "salt") else Seq("tile")

    val mbrOverlap =
      col("rxmax") >= col("sxmin") && col("rxmin") <= col("sxmax") &&
      col("rymax") >= col("symin") && col("rymin") <= col("symax")

    // reference-point dedup as a pure column expression (codegen):
    // the pair is kept only in the tile owning the intersection's min corner
    val refI = least(greatest(
      floor((greatest(col("rxmin"), col("sxmin")) - lit(grid.xMin)) / lit(grid.fineExtX)).cast("long"),
      lit(0L)), lit(grid.globalPpd - 1L))
    val refJ = least(greatest(
      floor((greatest(col("rymin"), col("symin")) - lit(grid.yMin)) / lit(grid.fineExtY)).cast("long"),
      lit(0L)), lit(grid.globalPpd - 1L))
    val dedup = (refI + refJ * grid.globalPpd) === col("tile")

    val refineUdf = udf {
      (p: Int, rg: Int, rc: Array[Double], sg: Int, sc: Array[Double]) =>
        Topology.evalPredicate(p, Geom(rg, rc), Geom(sg, sc))
    }
    // Rectangular fast path: for POINT/BOX pairs every predicate is a pure
    // coordinate comparison (DE-9IM on axis-aligned closed rectangles) — no
    // UDF, stays in whole-stage codegen. Exact arithmetic (no tolerance);
    // non-degenerate boxes assumed (zero-area rings are rejected at parse).
    val rectangular =
      (col("rg") === GeomType.POINT || col("rg") === GeomType.BOX) &&
      (col("sg") === GeomType.POINT || col("sg") === GeomType.BOX)
    val rPoint = col("rg") === GeomType.POINT
    val sPoint = col("sg") === GeomType.POINT
    val coordsEqual =
      col("rxmin") === col("sxmin") && col("rymin") === col("symin") &&
      col("rxmax") === col("sxmax") && col("rymax") === col("symax")
    val rInSClosed =
      col("rxmin") >= col("sxmin") && col("rxmax") <= col("sxmax") &&
      col("rymin") >= col("symin") && col("rymax") <= col("symax")
    val sInRClosed =
      col("sxmin") >= col("rxmin") && col("sxmax") <= col("rxmax") &&
      col("symin") >= col("rymin") && col("symax") <= col("rymax")
    val rPtStrictInS =
      col("rxmin") > col("sxmin") && col("rxmin") < col("sxmax") &&
      col("rymin") > col("symin") && col("rymin") < col("symax")
    val sPtStrictInR =
      col("sxmin") > col("rxmin") && col("sxmin") < col("rxmax") &&
      col("symin") > col("rymin") && col("symin") < col("rymax")
    // candidates already passed the closed MBR-overlap test
    val facingEdge =
      col("rxmin") === col("sxmax") || col("rxmax") === col("sxmin") ||
      col("rymin") === col("symax") || col("rymax") === col("symin")
    val rectExact: Column = pred match {
      case Predicates.INTERSECTS => lit(true)
      case Predicates.DISJOINT => lit(false) // tile-local candidates overlap
      case Predicates.EQUAL => coordsEqual
      case Predicates.INSIDE =>
        when(rPoint && sPoint, coordsEqual)
          .when(rPoint, rPtStrictInS)
          .when(sPoint, lit(false))
          .otherwise(rInSClosed)
      case Predicates.COVERED_BY =>
        when(rPoint && sPoint, coordsEqual)
          .when(rPoint, rInSClosed)
          .when(sPoint, lit(false))
          .otherwise(rInSClosed)
      case Predicates.CONTAINS =>
        when(rPoint && sPoint, coordsEqual)
          .when(sPoint, sPtStrictInR)
          .when(rPoint, lit(false))
          .otherwise(sInRClosed)
      case Predicates.COVERS =>
        when(rPoint && sPoint, coordsEqual)
          .when(sPoint, sInRClosed)
          .when(rPoint, lit(false))
          .otherwise(sInRClosed)
      case Predicates.MEET =>
        when(rPoint && sPoint, lit(false)) // points have no boundary
          .otherwise(facingEdge) // boundary-only contact given closed overlap
      case _ => lit(false)
    }
    def exactPredicate: Column =
      when(rectangular, rectExact)
        .otherwise(refineUdf(lit(pred), col("rg"), col("rc"), col("sg"), col("sc")))

    val joined0 = rt.join(st, joinKeys).where(mbrOverlap && dedup)
    // shuffle mode: attach geometry (+APRIL) payloads to the filtered
    // candidates by id
    val joined =
      if (slim)
        joined0.join(geomTable(rIx, "r", "rid"), Seq("rid"))
          .join(geomTable(sIx, "s", "sid"), Seq("sid"))
      else joined0

    val withVerdict = if (useApril) {
      val verdictUdf = udf {
        (p: Int, ra: Array[Long], rf: Array[Long], sa: Array[Long], sf: Array[Long]) =>
          April.verdict(p, April.Approx(ra, rf), April.Approx(sa, sf))
      }
      joined
        .withColumn("verdict",
          when(rectangular,
            when(rectExact, April.TRUE_HIT).otherwise(April.TRUE_NEGATIVE))
            .otherwise(verdictUdf(lit(pred),
              col("r_april_all"), col("r_april_full"),
              col("s_april_all"), col("s_april_full"))))
        .where(col("verdict") === April.TRUE_HIT ||
          (col("verdict") === April.INCONCLUSIVE && exactPredicate))
    } else {
      joined.where(exactPredicate)
    }
    withVerdict.select(col("rid"), col("sid"))
  }

  /** APRIL Hilbert order N (config_cluster.ini [APRIL] N=16). Per-pair
    * rasterization at query time like the reference's range path; dataset
    * joins should pre-rasterize at index-build — see aprilIndexed overloads
    * in later rounds. */
  val AprilOrder = 16

  /** Find-relation join: (rid, sid, relation) with the reference's TR codes.
    * With `useApril`, the APRIL topology intermediate filter resolves
    * DISJOINT / CONTAINS / INSIDE / true-hit-INTERSECT pairs from interval
    * algebra alone (the reference's MBR-case-specialized filter,
    * src/APRIL/filter.cpp:189-223); only unresolved pairs reach the exact
    * DE-9IM refinement. */
  def findRelationJoin(r: Dataset[GeoRow], s: Dataset[GeoRow],
                       grid: GridConfig, useApril: Boolean = false,
                       aprilOrder: Int = AprilOrder): DataFrame = {
    // APRIL interval lists are NOT shipped through the tile explode/shuffle
    // (they dwarf the ring coords); candidates re-join them by id from
    // compact per-object side tables after candidate generation.
    def ix(ds: Dataset[GeoRow]): DataFrame =
      if (!useApril) ds.toDF()
      else if (ds.toDF().columns.contains("april_all")) ds.toDF()
      else aprilIndex(ds.toDF(), grid, aprilOrder)
    val rIxDf = ix(r)
    val sIxDf = ix(s)
    // the exploded shuffle carries only ids + MBRs; geometry coords re-join
    // by id AFTER candidate filtering (carrying coord arrays through a
    // many-tiles-per-object explode multiplies shuffle bytes ~10x)
    val rt = withTiles2(rIxDf, grid).select(
      col("tile"), col("id").as("rid"),
      col("xmin").as("rxmin"), col("ymin").as("rymin"),
      col("xmax").as("rxmax"), col("ymax").as("rymax"))
    val st = withTiles2(sIxDf, grid).select(
      col("tile"), col("id").as("sid"),
      col("xmin").as("sxmin"), col("ymin").as("symin"),
      col("xmax").as("sxmax"), col("ymax").as("symax"))
    val rGeom = rIxDf.select(col("id").as("rid"), col("gtype").as("rg"),
      col("coords").as("rc"))
    val sGeom = sIxDf.select(col("id").as("sid"), col("gtype").as("sg"),
      col("coords").as("sc"))
    val mbrOverlap =
      col("rxmax") >= col("sxmin") && col("rxmin") <= col("sxmax") &&
      col("rymax") >= col("symin") && col("rymin") <= col("symax")
    val refI = least(greatest(
      floor((greatest(col("rxmin"), col("sxmin")) - lit(grid.xMin)) / lit(grid.fineExtX)).cast("long"),
      lit(0L)), lit(grid.globalPpd - 1L))
    val refJ = least(greatest(
      floor((greatest(col("rymin"), col("symin")) - lit(grid.yMin)) / lit(grid.fineExtY)).cast("long"),
      lit(0L)), lit(grid.globalPpd - 1L))
    val dedup = (refI + refJ * grid.globalPpd) === col("tile")
    val relUdf = udf { (rg: Int, rc: Array[Double], sg: Int, sc: Array[Double]) =>
      Topology.findRelation(Geom(rg, rc), Geom(sg, sc))
    }
    val joined = rt.join(st, Seq("tile")).where(mbrOverlap && dedup)
    if (!useApril) {
      joined
        .join(rGeom, Seq("rid")).join(sGeom, Seq("sid"))
        .select(col("rid"), col("sid"),
          relUdf(col("rg"), col("rc"), col("sg"), col("sc")).as("relation"))
    } else {
      // APRIL topology filter: -1 = unresolved (refine). Sound resolutions:
      //   no ALL overlap            → DISJOINT (candidates can't touch)
      //   ALL_S ⊆ FULL_R            → S strictly inside R's interior → CONTAINS
      //   ALL_R ⊆ FULL_S            → INSIDE
      //   interiors provably meet in the MBR_INTERSECT routing case → INTERSECT
      // MBR routing case as a pure column (0=EQUAL, 1=S_IN_R, 2=R_IN_S,
      // 3=INTERSECT) — mirrors relateMBRs' live branches
      val eps = 1e-8
      val dxmin = col("rxmin") - col("sxmin"); val dymin = col("rymin") - col("symin")
      val dxmax = col("rxmax") - col("sxmax"); val dymax = col("rymax") - col("symax")
      val mbrCase =
        when(abs(dxmin) < eps && abs(dxmax) < eps && abs(dymin) < eps && abs(dymax) < eps, 0)
          .when(dxmin <= 0 && dxmax >= 0 && dymin <= 0 && dymax >= 0, 1)
          .when(dxmin >= 0 && dxmax <= 0 && dymin >= 0 && dymax <= 0, 2)
          .otherwise(3)
      val aprilRel = udf { (ra: Array[Long], rf: Array[Long],
                            sa: Array[Long], sf: Array[Long], mc: Int) =>
        // mc==0 (EPS-equal MBRs) never yields DISJOINT in the reference's
        // routing (refineEqual... has no disjoint check) — defer to refine
        if (!April.intervalsOverlap(ra, sa)) {
          if (mc == 0) -1 else Topology.TR_DISJOINT
        }
        else if (April.intervalsContained(sa, rf)) Topology.TR_CONTAINS
        else if (April.intervalsContained(ra, sf)) Topology.TR_INSIDE
        else if (mc == 3 &&
          (April.intervalsOverlap(rf, sa) || April.intervalsOverlap(ra, sf)))
          // MBR_INTERSECT routing can only yield DISJOINT/MEET/INTERSECT;
          // interiors meeting rules out the first two.
          Topology.TR_INTERSECT
        else -1
      }
      // No broadcast hints: APRIL interval arrays scale with geometry size,
      // so forcing either side driver-resident dies at scale (8 GB broadcast
      // cap). These are shuffled equi-joins on id; AQE converts a genuinely
      // small side to a broadcast at runtime.
      val rApril = rIxDf.select(col("id").as("rid"),
        col("april_all").as("ra"), col("april_full").as("rf"))
      val sApril = sIxDf.select(col("id").as("sid"),
        col("april_all").as("sa"), col("april_full").as("sf"))
      joined
        .join(rApril, Seq("rid"))
        .join(sApril, Seq("sid"))
        .join(rGeom, Seq("rid")).join(sGeom, Seq("sid"))
        .withColumn("april_rel", aprilRel(col("ra"), col("rf"), col("sa"), col("sf"), mbrCase))
        .select(col("rid"), col("sid"),
          when(col("april_rel") >= 0, col("april_rel"))
            .otherwise(relUdf(col("rg"), col("rc"), col("sg"), col("sc")))
            .as("relation"))
    }
  }

  // ---------------------------------------------------------- range queries

  /** Batch range query: (queryId, id) for every data object intersecting the
    * query window. Query windows are broadcast (SURVEY §2.8); tile pruning
    * comes from the equi-join on the windows' exploded tile cover. */
  def rangeBatch(data: Dataset[GeoRow], queries: Seq[(Long, Geom)],
                 grid: GridConfig): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    val qRows = queries.flatMap { case (qid, g) =>
      val m = g.mbr
      grid.fineTiles(m).map(t => (qid, t, g.gtype, g.coords, m.xmin, m.ymin, m.xmax, m.ymax))
    }.toDF("qid", "tile", "qg", "qc", "qxmin", "qymin", "qxmax", "qymax")
    val dt = withTiles(data, grid)
    val mbrOverlap =
      col("xmax") >= col("qxmin") && col("xmin") <= col("qxmax") &&
      col("ymax") >= col("qymin") && col("ymin") <= col("qymax")
    val refI = least(greatest(
      floor((greatest(col("xmin"), col("qxmin")) - lit(grid.xMin)) / lit(grid.fineExtX)).cast("long"),
      lit(0L)), lit(grid.globalPpd - 1L))
    val refJ = least(greatest(
      floor((greatest(col("ymin"), col("qymin")) - lit(grid.yMin)) / lit(grid.fineExtY)).cast("long"),
      lit(0L)), lit(grid.globalPpd - 1L))
    val dedup = (refI + refJ * grid.globalPpd) === col("tile")
    val intersectsUdf = udf { (qg: Int, qc: Array[Double], g: Int, c: Array[Double]) =>
      Topology.intersects(Geom(qg, qc), Geom(g, c))
    }
    // rectangular fast path: for BOX windows over POINT/BOX data the MBR
    // overlap (already applied) IS the exact predicate — the reference's
    // interior-tile shortcut generalized to the whole rectangular case
    val rectangular =
      col("qg") === GeomType.BOX &&
      (col("gtype") === GeomType.POINT || col("gtype") === GeomType.BOX)
    dt.join(broadcast(qRows), Seq("tile"))
      .where(mbrOverlap && dedup &&
        when(rectangular, lit(true))
          .otherwise(intersectsUdf(col("qg"), col("qc"), col("gtype"), col("coords"))))
      .select(col("qid"), col("id"))
  }

  // ------------------------------------------------------------------- kNN

  /**
   * Batch kNN over point data: ascending (distance, id) per query, exactly
   * k rows each — reproducing the reference's heap-drain output order
   * (API/containers.cpp:961-972). One pass over the data for the whole
   * broadcast batch + windowed top-k; map-side partial top-k pruning is a
   * planned round-2 optimization (the reference likewise scans all tiles
   * with only a tile lower-bound prune, knn_filter.cpp:27-39).
   */
  def knnBatch(points: Dataset[GeoRow], queries: Seq[(Long, Geom)], k: Int,
               gridOpt: Option[GridConfig] = None): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val grid = gridOpt.getOrElse(gridFor(dataspace(points)))

    // Phase 1 (one tiny job): per-tile point counts → driver map. Bounded by
    // globalPpd² tiles regardless of data size, so this scales to any N.
    val homeUdf = udf { (x: Double, y: Double) => grid.fineTileOfPoint(x, y) }
    val tileCounts: Map[Long, Long] = points
      .select(homeUdf(col("xmin"), col("ymin")).as("tile"))
      .groupBy("tile").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // Phase 2 (driver, per query): expand Chebyshev rings from the home tile
    // until ≥k points are covered, derive a safe kth-distance upper bound
    // from the covered box, and emit every tile whose min distance to the
    // query is within the bound — the reference's checkDistance prune
    // (knn_filter.cpp:27-39) batched.
    val qTiles = queries.flatMap { case (qid, g) =>
      val qx = g.coords(0); val qy = g.coords(1)
      candidateKnnTiles(qx, qy, k, grid, tileCounts).map(t => (qid, t, qx, qy))
    }.toDF("qid", "tile", "qx", "qy")

    // Phase 3: tile equi-join (queries broadcast) → exact distance → bounded
    // heap per query; shuffles ≤ k·parts rows per query.
    val dist = sqrt(
      (col("xmin") - col("qx")) * (col("xmin") - col("qx")) +
      (col("ymin") - col("qy")) * (col("ymin") - col("qy")))
    val topk = new graft.functions.TopKAggregator(k).toColumn
    points.withColumn("tile", homeUdf(col("xmin"), col("ymin")))
      .join(broadcast(qTiles), Seq("tile"))
      .select(col("qid"), col("id"), dist.as("dist"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(topk.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(col("qid"), col("pair._1").as("id"), col("pair._2").as("dist"),
        (col("pos") + 1).cast("int").as("rnk"))
  }

  /** Tiles that can contain one of the k nearest neighbors of (qx, qy). */
  private def candidateKnnTiles(qx: Double, qy: Double, k: Int,
      grid: GridConfig, tileCounts: Map[Long, Long]): Seq[Long] = {
    val ppd = grid.globalPpd
    val hi = math.min(math.max(grid.fineX(qx), 0), ppd - 1)
    val hj = math.min(math.max(grid.fineY(qy), 0), ppd - 1)
    var cum = 0L
    var r = 0
    var found = -1
    while (found < 0 && r < ppd) {
      // cells on the Chebyshev ring of radius r
      var covered = 0L
      var i = math.max(hi - r, 0)
      while (i <= math.min(hi + r, ppd - 1)) {
        var j = math.max(hj - r, 0)
        while (j <= math.min(hj + r, ppd - 1)) {
          if (math.max(math.abs(i - hi), math.abs(j - hj)) == r) {
            covered += tileCounts.getOrElse(grid.tileId(i, j), 0L)
          }
          j += 1
        }
        i += 1
      }
      cum += covered
      if (cum >= k) found = r
      r += 1
    }
    if (found < 0) return tileCounts.keys.toSeq // fewer than k points overall
    // kth distance bound: the farthest corner of the covered (2·found+1) box
    val m = MBR(grid.xMin + (hi - found) * grid.fineExtX,
                grid.yMin + (hj - found) * grid.fineExtY,
                grid.xMin + (hi + found + 1) * grid.fineExtX,
                grid.yMin + (hj + found + 1) * grid.fineExtY)
    val bound = math.sqrt(Seq(
      (qx - m.xmin) * (qx - m.xmin) + (qy - m.ymin) * (qy - m.ymin),
      (qx - m.xmin) * (qx - m.xmin) + (qy - m.ymax) * (qy - m.ymax),
      (qx - m.xmax) * (qx - m.xmax) + (qy - m.ymin) * (qy - m.ymin),
      (qx - m.xmax) * (qx - m.xmax) + (qy - m.ymax) * (qy - m.ymax)).max)
    val rCap = math.max(
      math.ceil(bound / grid.fineExtX).toInt,
      math.ceil(bound / grid.fineExtY).toInt) + 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = math.max(hi - rCap, 0)
    while (i <= math.min(hi + rCap, ppd - 1)) {
      var j = math.max(hj - rCap, 0)
      while (j <= math.min(hj + rCap, ppd - 1)) {
        val t = grid.tileId(i, j)
        if (tileCounts.contains(t) && grid.distanceToTile(qx, qy, t) <= bound)
          out += t
        j += 1
      }
      i += 1
    }
    out.toSeq
  }

  // --------------------------------------------------------- distance join

  /** ε-distance join over point datasets: (rid, sid) with dist <= d.
    * R explodes to its ε-expanded tile cover; S stays at its home tile —
    * one shuffle replaces the reference's 3-phase MPI exchange
    * (src/UniformGrid/dj_filter.cpp). */
  def distanceJoin(r: Dataset[GeoRow], s: Dataset[GeoRow], d: Double,
                   grid: GridConfig): DataFrame = {
    val coverUdf = udf { (x: Double, y: Double) => grid.tilesWithinDistance(x, y, d) }
    val rt = r.withColumn("tile", explode(coverUdf(col("xmin"), col("ymin"))))
      .select(col("tile"), col("id").as("rid"), col("xmin").as("rx"), col("ymin").as("ry"))
    val homeUdf = udf { (x: Double, y: Double) => grid.fineTileOfPoint(x, y) }
    val st = s.select(homeUdf(col("xmin"), col("ymin")).as("tile"),
      col("id").as("sid"), col("xmin").as("sx"), col("ymin").as("sy"))
    val dist = sqrt(
      (col("rx") - col("sx")) * (col("rx") - col("sx")) +
      (col("ry") - col("sy")) * (col("ry") - col("sy")))
    rt.join(st, Seq("tile")).where(dist <= d).select(col("rid"), col("sid"))
  }
}
