package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{KmvBuffer, TopKBuffer}

/** r8 (verdict #8): the shuffle-volume contract of the custom aggregates,
  * pinned as a law. The k-NN join's scale claim ("the exchange carries
  * ≤ k rows per partial no matter how many billions of rows feed it")
  * rests entirely on `top_k_by` / `kmv_distinct` partials staying
  * k-bounded — if an edit ever let a buffer grow with the input, every
  * plan built on them would silently reacquire a data-sized shuffle.
  * ScalaCheck drives arbitrary input lengths, value distributions
  * (duplicates, ties, extremes) and arbitrary merge trees; the law is
  * that the SERIALIZED byte size never exceeds the k-derived bound, and
  * that eval still agrees with the brute-force reference after any
  * update/merge history. */
class BoundedBufferPropertySpec extends AnyFunSuite {

  private val checkParams = SCTest.Parameters.default.withMinSuccessfulTests(40)

  private def run(name: String, prop: org.scalacheck.Prop): Unit = {
    val r = SCTest.check(checkParams, prop)
    assert(r.passed, s"$name: $r")
  }

  private def topKSer(b: TopKBuffer): Int = 4 + 16 * b.size
  private def kmvSer(b: KmvBuffer): Int = 4 + 8 * b.size

  private val inputs: Gen[(Int, List[List[Double]])] = for {
    k <- Gen.chooseNum(1, 64)
    nParts <- Gen.chooseNum(1, 8)
    parts <- Gen.listOfN(nParts, Gen.listOf(Gen.oneOf(
      Gen.chooseNum(0.0, 1.0),
      Gen.oneOf(0.0, 1.0, 0.5, 0.25, 0.25, 0.125)))) // duplicate-heavy mix
  } yield (k, parts)

  test("law: top_k_by serialized partials are O(k) for any input and merge tree") {
    run("topk", forAll(inputs) { case (k, parts) =>
      // simulate map-side partials then an arbitrary left-fold merge tree
      val partials = parts.zipWithIndex.map { case (vs, p) =>
        val b = new TopKBuffer(k)
        vs.zipWithIndex.foreach { case (v, i) => b.insert(v, (p.toLong << 32) | i.toLong) }
        b
      }
      val serBound = partials.forall(b => b.size <= k && topKSer(b) <= 4 + 16 * k)
      val merged = partials.reduceLeft { (a, b) =>
        (0 until b.size).foreach(i => a.insert(b.scores(i), b.ids(i))); a
      }
      // reference: k best (score DESC, id ASC) over all inputs
      val all = parts.zipWithIndex.flatMap { case (vs, p) =>
        vs.zipWithIndex.map { case (v, i) => (v, (p.toLong << 32) | i.toLong) }
      }
      val want = all.sortBy { case (s, id) => (-s, id) }.take(k).toSet
      val got = (0 until merged.size).map(i => (merged.scores(i), merged.ids(i))).toSet
      merged.size <= k && topKSer(merged) <= 4 + 16 * k && got == want && serBound
    })
  }

  test("law: kmv_distinct serialized partials are O(k) for any input and merge tree") {
    run("kmv", forAll(inputs) { case (k, parts) =>
      val partials = parts.map { vs =>
        val b = new KmvBuffer(k)
        vs.foreach(b.insert)
        b
      }
      val serBound = partials.forall(b => b.size <= k && kmvSer(b) <= 4 + 8 * k)
      val merged = partials.reduceLeft { (a, b) =>
        (0 until b.size).foreach(i => a.insert(b.hs(i))); a
      }
      // reference: the k smallest DISTINCT values, ascending
      val want = parts.flatten.distinct.sorted.take(k)
      val got = (0 until merged.size).map(merged.hs).toList
      merged.size <= k && kmvSer(merged) <= 4 + 8 * k && got == want && serBound
    })
  }
}
