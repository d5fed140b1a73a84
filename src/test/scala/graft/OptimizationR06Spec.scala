package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.web.Pages

/**
 * Round-6 optimization guards:
 *  - static dispatch SideMeta constants are SAFE vs the dynamically computed
 *    metadata on the real bench inputs (a wrong static flag would silently
 *    drop a candidate sub-join);
 *  - the column-only page synthesis is byte-identical to the typed path;
 *  - the stored-index serving path size-dispatches (path snapshot small,
 *    bucketed catalog large);
 *  - the widen guard no-ops when the input is already near target
 *    parallelism, and still widens clearly-narrow inputs.
 */
class OptimizationR06Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  test("static SideMeta constants are safe vs dynamic sideMeta on bench inputs") {
    val triples = SparkEntry.staticMetaPairs(spark, sfDir)
    assert(triples.size == 10)
    triples.foreach { case (name, st, dy) =>
      // type flags must be EXACT (they gate the all-rect fast path and the
      // geometry/APRIL attach shape)
      assert(st.hasNonRect == dy.hasNonRect, s"$name hasNonRect")
      assert(st.hasNonBox == dy.hasNonBox, s"$name hasNonBox")
      assert(st.hasRect == dy.hasRect, s"$name hasRect")
      assert(st.hasBox == dy.hasBox, s"$name hasBox")
      // presence flags: dynamic presence must imply the static flag — a
      // static `false` where rows exist would DROP a sub-join that can
      // produce pairs (the converse, static true / dynamic false, only adds
      // a provably-empty branch)
      assert(!dy.hasWide || st.hasWide, s"$name hasWide unsafe")
      assert(!dy.hasNarrow || st.hasNarrow, s"$name hasNarrow unsafe")
    }
  }

  test("column-only page synthesis is byte-identical to the typed path") {
    val typed = Pages.synthesize(spark, 500).toDF()
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val cols = Pages.synthesizeUrlText(spark, 500).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cols == typed)
    assert(cols.size == 500)
  }

  test("stored-index serving size-dispatches: snapshot small, bucketed large") {
    // default threshold (256 MB) >> sf0.001 source: path snapshot
    val nParts = spark.read.parquet(s"$sfDir/part.parquet").count()
    val small = SparkEntry.diamondIndex(spark, sfDir)
    val smallPlan = small.df.queryExecution.analyzed.toString
    assert(!smallPlan.contains("diamonds_o10_b_"),
      "small index must not serve from the bucketed catalog table")
    assert(small.df.count() == nParts)
    // threshold 1 byte: bucketed catalog table, nBuckets = parallelism
    spark.conf.set("spark.graft.index.bucketedMinBytes", "1")
    try {
      val large = SparkEntry.diamondIndex(spark, sfDir)
      val largePlan = large.df.queryExecution.analyzed.toString
      assert(largePlan.contains("diamonds_o10_b_"),
        s"large index must serve from the bucketed catalog table: $largePlan")
      assert(large.df.count() == nParts)
      // both serving forms carry the same dispatch metadata
      assert(large.meta == small.meta)
    } finally spark.conf.unset("spark.graft.index.bucketedMinBytes")
  }

  test("widen guard: no-op near target parallelism, widens narrow inputs") {
    val target = spark.sparkContext.defaultParallelism // 4
    val near = spark.range(0, 1000, 1, target / 2).toDF() // half of target
    assert(GeoEngine.widen(near).rdd.getNumPartitions == target / 2,
      "an input within 2x of target must not pay a repartition")
    val narrow = spark.range(0, 1000, 1, 1).toDF()
    assert(GeoEngine.widen(narrow).rdd.getNumPartitions == target,
      "a clearly narrow input must still widen")
    val wide = spark.range(0, 1000, 1, target + 2).toDF()
    assert(GeoEngine.widen(wide).rdd.getNumPartitions == target + 2)
  }

  test("dupGroups small path (limit-probe) matches union-find semantics") {
    import spark.implicits._
    // two components + an isolated self-pair to drop
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 5L))
      .toDF("a", "b")
    val got = graft.ops.TextOps.dupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
