package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.core.{April, Predicates}
import graft.functions.GeoKernels

/** The zero-copy ArrayData interval algebra in GeoKernels must agree with
  * April's canonical array implementation on every input — the expression
  * path is the one the joins execute, April the one the unit/property
  * suite pins. Seeded random interval lists (sorted, disjoint) + edge
  * cases (empty, single interval, identical lists). */
class AprilKernelParitySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260822L)

  /** Random sorted disjoint interval list with `n` intervals. */
  private def intervals(n: Int): Array[Long] = {
    var cur = rnd.nextInt(20).toLong
    val out = new Array[Long](2 * n)
    var i = 0
    while (i < n) {
      val s = cur + rnd.nextInt(10)
      val e = s + 1 + rnd.nextInt(12)
      out(2 * i) = s; out(2 * i + 1) = e
      cur = e + rnd.nextInt(8)
      i += 1
    }
    out
  }

  private val cases: Seq[(Array[Long], Array[Long])] = {
    val lists = Seq(Array.emptyLongArray, intervals(1), intervals(1),
      intervals(2), intervals(5), intervals(20), intervals(100)) ++
      (1 to 200).map(_ => intervals(rnd.nextInt(12)))
    for (a <- lists; b <- lists.take(12)) yield (a, b)
  }

  test("overlap/contained parity with April across random interval lists") {
    cases.foreach { case (a, b) =>
      val ad = new GenericArrayData(a)
      val bd = new GenericArrayData(b)
      assert(GeoKernels.overlapAD(ad, bd) == April.intervalsOverlap(a, b),
        s"overlap a=${a.toSeq} b=${b.toSeq}")
      assert(GeoKernels.containedAD(ad, bd) == April.intervalsContained(a, b),
        s"contained a=${a.toSeq} b=${b.toSeq}")
    }
  }

  test("aprilVerdict parity with April.verdict across all predicates") {
    val preds = Seq(Predicates.INTERSECTS, Predicates.DISJOINT,
      Predicates.INSIDE, Predicates.COVERED_BY, Predicates.CONTAINS,
      Predicates.COVERS, Predicates.EQUAL, Predicates.MEET)
    val quads = (1 to 400).map(_ => (intervals(rnd.nextInt(8)),
      intervals(rnd.nextInt(4)), intervals(rnd.nextInt(8)),
      intervals(rnd.nextInt(4)))) ++
      Seq((Array.emptyLongArray, Array.emptyLongArray,
        Array.emptyLongArray, Array.emptyLongArray))
    quads.foreach { case (ra, rf, sa, sf) =>
      val (raD, rfD, saD, sfD) = (new GenericArrayData(ra),
        new GenericArrayData(rf), new GenericArrayData(sa),
        new GenericArrayData(sf))
      preds.foreach { p =>
        assert(GeoKernels.aprilVerdict(p, raD, rfD, saD, sfD) ==
          April.verdict(p, April.Approx(ra, rf), April.Approx(sa, sf)),
          s"pred $p ra=${ra.toSeq} rf=${rf.toSeq} sa=${sa.toSeq} sf=${sf.toSeq}")
      }
    }
  }
}
