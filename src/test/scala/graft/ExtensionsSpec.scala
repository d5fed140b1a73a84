package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** SQL surface: the native expressions registered via SparkSessionExtensions
  * must agree with the kernel API through plain spark.sql text. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // all suites share one JVM: getOrCreate would silently reuse a session
    // built WITHOUT the extensions — force a fresh session (the existing
    // SparkContext is reused, only the session state is new)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // the static `spark.sql.extensions` conf only applies at SparkContext
    // creation; with a pre-existing context (shared test JVM) the builder's
    // withExtensions hook is the supported injection point
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions()(_))
      .getOrCreate()
  }

  private def mkView(): Unit = {
    import spark.implicits._
    val rows = Seq(
      // id, gtype, coords: two boxes + a point + a triangle
      (1L, GeomType.BOX, Array(0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0)),
      (2L, GeomType.BOX, Array(1.0, 1.0, 3.0, 1.0, 3.0, 3.0, 1.0, 3.0, 1.0, 1.0)),
      (3L, GeomType.POINT, Array(2.0, 2.0)),
      (4L, GeomType.BOX, Array(4.0, 0.0, 8.0, 0.0, 8.0, 4.0, 4.0, 4.0, 4.0, 0.0)),
      (5L, GeomType.POLYGON, Array(10.0, 10.0, 12.0, 10.0, 11.0, 12.0, 10.0, 10.0)))
    rows.toDF("id", "gtype", "coords").createOrReplaceTempView("geoms")
  }

  test("st_* SQL functions agree with the Topology kernels") {
    mkView()
    val pairs = spark.sql(
      """SELECT a.id AS ra, b.id AS rb,
        |  st_intersects(a.gtype, a.coords, b.gtype, b.coords) AS inter,
        |  st_contains(a.gtype, a.coords, b.gtype, b.coords) AS cont,
        |  st_meets(a.gtype, a.coords, b.gtype, b.coords) AS meet,
        |  st_relation(a.gtype, a.coords, b.gtype, b.coords) AS rel
        |FROM geoms a JOIN geoms b ON a.id < b.id""".stripMargin)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getInt(5)))).toMap
    assert(pairs((1L, 2L)) == ((true, true, false, Topology.TR_CONTAINS)))
    assert(pairs((1L, 3L))._1 && pairs((1L, 3L))._2) // point inside box
    assert(pairs((1L, 4L)) == ((true, false, true, Topology.TR_MEET)))
    assert(pairs((2L, 4L))._1 == false)
    assert(pairs((1L, 5L)) == ((false, false, false, Topology.TR_DISJOINT)))
  }

  test("st_* predicates in a SQL join filter use codegen (no ScalaUDF in plan)") {
    mkView()
    val df = spark.sql(
      """SELECT a.id, b.id FROM geoms a JOIN geoms b
        |ON a.id < b.id AND st_intersects(a.gtype, a.coords, b.gtype, b.coords)""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("st_refine"), plan.take(500))
    assert(!plan.contains("ScalaUDF"))
    assert(df.count() == 4)
  }
}
