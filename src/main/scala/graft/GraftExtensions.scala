package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.core.Predicates
import graft.functions._

/**
 * SparkSessionExtensions integration: registers the engine's native
 * Catalyst expressions as SQL functions, so `spark.sql` users can call the
 * geometry kernels directly —
 *
 *   spark.sql("SELECT * FROM r JOIN s ON st_intersects(r.gtype, r.coords,
 *                                                      s.gtype, s.coords)")
 *
 * Enable with
 *   .config("spark.sql.extensions", "graft.GraftExtensions")
 * or inject programmatically via `SparkSession.builder.withExtensions`.
 *
 * Registered functions (all codegen expressions, no UDF overhead):
 *   st_intersects / st_inside / st_disjoint / st_equals / st_meets /
 *   st_contains / st_covers / st_covered_by (gtypeA, coordsA, gtypeB, coordsB)
 *   st_relation(gtypeA, coordsA, gtypeB, coordsB) → TR_* relation code
 *   april_verdict(pred, allA, fullA, allB, fullB) → verdict code
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def predFn(name: String, pred: Int): Unit =
      register(ext, name, s"exact spatial predicate $name", { args =>
        require(args.length == 4, s"$name expects (gtypeA, coordsA, gtypeB, coordsB)")
        STRefine(pred, args(0), args(1), args(2), args(3))
      })

    predFn("st_intersects", Predicates.INTERSECTS)
    predFn("st_inside", Predicates.INSIDE)
    predFn("st_disjoint", Predicates.DISJOINT)
    predFn("st_equals", Predicates.EQUAL)
    predFn("st_meets", Predicates.MEET)
    predFn("st_contains", Predicates.CONTAINS)
    predFn("st_covers", Predicates.COVERS)
    predFn("st_covered_by", Predicates.COVERED_BY)

    register(ext, "st_relation", "DE-9IM relation code (TR_*)", { args =>
      require(args.length == 4, "st_relation expects (gtypeA, coordsA, gtypeB, coordsB)")
      STFindRelation(args(0), args(1), args(2), args(3))
    })
    register(ext, "april_verdict",
      "APRIL interval verdict (0=negative, 1=hit, 2=inconclusive)", { args =>
        require(args.length == 5, "april_verdict expects (pred, allA, fullA, allB, fullB)")
        val pred = args.head match {
          case Literal(v: Int, _) => v
          case other => sys.error(s"april_verdict: pred must be an int literal, got $other")
        }
        AprilVerdict(pred, args(1), args(2), args(3), args(4))
      })

    // a bare `JOIN ... ON st_<pred>(...)` would execute as a cartesian
    // product; this rule rewrites it into the multi-resolution tile-exchange
    // plan (see graft.plans.SpatialJoinRewrite; kill switch
    // spark.graft.join.rewrite=false)
    ext.injectOptimizerRule(session => graft.plans.SpatialJoinRewrite(session))
  }

  private def register(ext: SparkSessionExtensions, name: String, usage: String,
                       builder: Seq[Expression] => Expression): Unit = {
    val info = new ExpressionInfo("graft.functions.GeoExpressions", name, usage)
    val fb: FunctionBuilder = (args: Seq[Expression]) => builder(args)
    ext.injectFunction((FunctionIdentifier(name), info, fb))
  }
}
