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
}
