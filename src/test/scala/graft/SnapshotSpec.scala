package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.store.Snapshots

/** Snapshot store: commit atomicity, manifests with per-partition metrics,
  * stage resume without recomputation. */
class SnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_snap_test").toString

  test("commit + load round trip with manifest metrics") {
    val root = freshRoot()
    import spark.implicits._
    val df = spark.range(0, 1000, 1, 4).select(col("id"), (col("id") * 2).as("v"))
    val m = Snapshots.commit(df, root, "t1", Map("src" -> "range"))
    assert(m.snapshotId == 1L)
    assert(m.totalRows == 1000L)
    assert(m.partitions.map(_.rows).sum == 1000L)
    assert(m.partitions.size == 4)
    val back = Snapshots.load(spark, root, "t1").get
    assert(back.count() == 1000L)
    assert(back.agg(sum("v")).head().getLong(0) == 999L * 1000L)
    val manifestJson = Snapshots.latestManifest(root, "t1").get
    assert(manifestJson.contains("\"src\": \"range\"") || manifestJson.contains("\"src\":\"range\""))
  }

  test("successive commits bump the snapshot id; LATEST points at the newest") {
    val root = freshRoot()
    val df1 = spark.range(10).toDF("id")
    val df2 = spark.range(20).toDF("id")
    Snapshots.commit(df1, root, "t", Map.empty)
    Snapshots.commit(df2, root, "t", Map.empty)
    assert(Snapshots.latestId(root, "t").contains(2L))
    assert(Snapshots.load(spark, root, "t").get.count() == 20L)
  }

  test("runStage resumes from the committed snapshot without recomputation") {
    val root = freshRoot()
    var invocations = 0
    def stage() = Snapshots.runStage(spark, root, "stage1", Map("k" -> "v")) {
      invocations += 1
      spark.range(100).toDF("id")
    }
    assert(stage().count() == 100L)
    assert(invocations == 1)
    // a "restarted job": same stage again — must load, not recompute
    assert(stage().count() == 100L)
    assert(invocations == 1)
  }

  test("uncommitted (crashed) snapshot dir is ignored on resume") {
    val root = freshRoot()
    Snapshots.commit(spark.range(5).toDF("id"), root, "t", Map.empty)
    // simulate a crash: snapshot dir exists but LATEST never swapped
    val orphan = java.nio.file.Paths.get(root, "t", "snap-00002", "data")
    java.nio.file.Files.createDirectories(orphan)
    assert(Snapshots.latestId(root, "t").contains(1L))
    assert(Snapshots.load(spark, root, "t").get.count() == 5L)
    // next commit skips over the orphan id
    val m = Snapshots.commit(spark.range(7).toDF("id"), root, "t", Map.empty)
    assert(m.snapshotId == 2L) // overwrite-stage the orphan dir
    assert(Snapshots.load(spark, root, "t").get.count() == 7L)
  }

  test("persisted APRIL index: build → load round-trips data, lists and meta") {
    import spark.implicits._
    val root = freshRoot()
    val grid = graft.web.Pages.WorldGrid
    def diamonds(n: Int) = (0 until n).map { i =>
      val cx = (i * 13 % 2800) / 8.0 - 175.0
      val cy = (i * 17 % 1280) / 8.0 - 80.0
      val hw = (i % 40 + 2) / 8.0; val hh = (i % 30 + 2) / 8.0
      GeoRow(i.toLong, core.GeomType.POLYGON,
        Array(cx - hw, cy, cx, cy - hh, cx + hw, cy, cx, cy + hh, cx - hw, cy),
        cx - hw, cy - hh, cx + hw, cy + hh)
    }.toDS()
    def points(n: Int) = (0 until n).map { i =>
      val x = (i * 7 % 2880) / 8.0 - 180.0
      val y = (i * 11 % 1360) / 8.0 - 85.0
      GeoRow(i.toLong, core.GeomType.POINT, Array(x, y), x, y, x, y)
    }.toDS()
    var builds = 0
    def ensure() = graft.store.SpatialIndex.ensure(spark, root, "diamonds",
      grid, order = 10) { builds += 1; diamonds(300).toDF() }
    ensure()
    assert(builds == 1)
    // resume: a second ensure loads the committed snapshot, no rebuild
    val again = ensure()
    assert(builds == 1)
    // a DIFFERENT april order must NOT serve the stored order-10 lists
    // (incomparable cell spaces would silently drop true hits) — rebuild
    graft.store.SpatialIndex.ensure(spark, root, "diamonds", grid,
      order = 12) { builds += 1; diamonds(300).toDF() }
    assert(builds == 2, "order mismatch must rebuild the index")
    // and ensure() at the original order rebuilds again (latest snapshot is
    // the order-12 one) — parameters always win over what happens to be stored
    ensure()
    assert(builds == 3)
    // persisted SideMeta round-trips (incl. the density statistic)
    val fresh = GeoEngine.sideMeta(diamonds(300), grid)
    assert(again.meta == fresh)
    // the snapshot carries the interval lists: a query over the loaded index
    // must NOT re-rasterize, and must equal the query over raw data
    assert(again.df.columns.contains("april_all"))
    val overIndex = GeoEngine.spatialJoin(points(2000), again.df.as[GeoRow],
      core.Predicates.INTERSECTS, grid, useApril = true, aprilOrder = 10,
      sMeta = Some(again.meta))
    assert(!overIndex.queryExecution.optimizedPlan.toString
      .contains("april_rasterize"))
    val overRaw = GeoEngine.spatialJoin(points(2000), diamonds(300),
      core.Predicates.INTERSECTS, grid, useApril = true, aprilOrder = 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(overIndex) == pairs(overRaw))
    // lists in the snapshot are bit-identical to a fresh rasterization
    val storedLists = again.df
      .select(col("id"), col("april_all"), col("april_full"))
      .collect().map(r => (r.getLong(0),
        (r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))).toMap
    val freshLists = GeoEngine.aprilIndex(diamonds(300).toDF(), grid, 10)
      .select(col("id"), col("april_all"), col("april_full"))
      .collect().map(r => (r.getLong(0),
        (r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))).toMap
    assert(storedLists == freshLists)
  }

  test("bucketed index: id re-join drops the index-side exchange, same pairs") {
    import spark.implicits._
    val grid = graft.web.Pages.WorldGrid
    def diamonds(n: Int) = (0 until n).map { i =>
      val cx = (i * 13 % 2800) / 8.0 - 175.0
      val cy = (i * 17 % 1280) / 8.0 - 80.0
      val hw = (i % 40 + 2) / 8.0; val hh = (i % 30 + 2) / 8.0
      GeoRow(i.toLong, core.GeomType.POLYGON,
        Array(cx - hw, cy, cx, cy - hh, cx + hw, cy, cx, cy + hh, cx - hw, cy),
        cx - hw, cy - hh, cx + hw, cy + hh)
    }.toDS()
    def points(n: Int) = (0 until n).map { i =>
      val x = (i * 7 % 2880) / 8.0 - 180.0
      val y = (i * 11 % 1360) / 8.0 - 85.0
      GeoRow(i.toLong, core.GeomType.POINT, Array(x, y), x, y, x, y)
    }.toDS()
    val table = "graft_test_diamonds_bucketed"
    var builds = 0
    def ensure() = graft.store.SpatialIndex.ensureBucketed(
      spark, table, grid, order = 10, nBuckets = 4) {
      builds += 1; diamonds(300).toDF()
    }
    try {
      val idx = ensure()
      assert(builds == 1)
      ensure(); assert(builds == 1, "matching params must load, not rebuild")
      // AQE + broadcast off so the physical exchanges are deterministic
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        def join(s: org.apache.spark.sql.DataFrame) =
          GeoEngine.spatialJoin(points(2000), s.as[GeoRow],
            core.Predicates.INTERSECTS, grid, useApril = true,
            aprilOrder = 10, sMeta = Some(idx.meta))
        val bucketed = join(idx.df)
        val plain = join(graft.store.SpatialIndex.ensure(spark,
          freshRoot(), "diamonds_plain", grid, order = 10) {
          diamonds(300).toDF()
        }.df)
        def pairs(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(pairs(bucketed) == pairs(plain))
        assert(pairs(bucketed).nonEmpty)
        // the bucketed scan reports its spec, and the plan needs strictly
        // fewer exchanges (the index side of the id re-join is
        // pre-partitioned; the slim candidate side still shuffles)
        val bPlan = bucketed.queryExecution.executedPlan.toString
        val pPlan = plain.queryExecution.executedPlan.toString
        assert(bPlan.contains("Bucketed: true"),
          "bucketed table scan lost its bucket spec")
        val bEx = "Exchange".r.findAllIn(bPlan).length
        val pEx = "Exchange".r.findAllIn(pPlan).length
        assert(bEx < pEx, s"expected fewer exchanges: bucketed=$bEx plain=$pEx")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.enabled")
      }
      // a different APRIL order must NOT serve the stored lists (same
      // incomparable-cell-space hazard as the path-based ensure) — rebuild.
      // (Done LAST: the overwrite invalidates earlier readers' file lists,
      // standard Spark managed-table semantics.)
      graft.store.SpatialIndex.ensureBucketed(
        spark, table, grid, order = 12, nBuckets = 4) {
        builds += 1; diamonds(300).toDF()
      }
      assert(builds == 2, "order mismatch must rebuild the bucketed index")
      ensure(); assert(builds == 3, "params win over what happens to be stored")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("GraftJob pipeline: kill/resume covers all five stages incl. index") {
    val root = freshRoot()
    val out1 = GraftJob.run(spark, root, nPages = 2000L)
    assert(out1.contains(""""pages":2000"""))
    assert(out1.contains(""""indexed":2000"""))
    // every path stage committed exactly one snapshot; the index stage is
    // a bucketed catalog table carrying its lineage in TBLPROPERTIES
    for (t <- Seq("pages", "geotagged", "tiles", "joined"))
      assert(Snapshots.latestId(root, t).contains(1L), s"stage $t")
    assert(spark.catalog.tableExists("polygons_idx_b"))
    val props = spark.sql("SHOW TBLPROPERTIES polygons_idx_b").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.april_order").contains("10"))
    // "kill" after the index stage: drop the join snapshot, restart — the
    // first four stages (index included) must LOAD, only the join recomputes
    def deleteRec(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).iterator().asScala.toList.foreach(deleteRec)
      java.nio.file.Files.delete(p)
    }
    deleteRec(java.nio.file.Paths.get(root, "joined"))
    // fingerprint the index table's data files: a resumed run must LOAD
    // the bucketed table, not silently rebuild it (same output either way,
    // so the file mtimes are the observable)
    def tableFiles(): Map[String, Long] = {
      val loc = spark.sql("DESCRIBE EXTENDED polygons_idx_b").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      new java.io.File(new java.net.URI(loc)).listFiles()
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val filesBefore = tableFiles()
    val out2 = GraftJob.run(spark, root, nPages = 2000L)
    assert(out2 == out1,
      s"resumed run must reproduce the pipeline output\n$out1\n$out2")
    assert(tableFiles() == filesBefore,
      "bucketed index stage rebuilt on resume despite matching params")
    // resume did NOT bump the upstream snapshot ids (no recomputation)
    for (t <- Seq("pages", "geotagged", "tiles"))
      assert(Snapshots.latestId(root, t).contains(1L), s"stage $t recomputed")
    assert(Snapshots.latestId(root, "joined").contains(1L))
    // the joined stage genuinely read the stored index: its rows match an
    // independent join over the same synthetic inputs
    val joined = Snapshots.load(spark, root, "joined").get
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS polygons_idx_b")
  }
}
