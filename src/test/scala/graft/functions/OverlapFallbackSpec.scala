package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Parity of the ≥2^29 sorted-array fallbacks with the open-addressing
  * mainline (ADVICE r12: the boxed-HashSet fallback was an OOM wearing
  * a "graceful" label — replaced with flat primitive sorted arrays).
  * The 2^29 trigger itself is untestable in a unit heap, so the
  * fallback is exercised DIRECTLY on the same inputs as the mainline
  * and must agree bit-for-bit, including the semantics corners:
  * duplicates count once, 0 is an ordinary long element, null elements
  * in both string sides count one, and the early-exit paths. */
class OverlapFallbackSpec extends AnyFunSuite {

  private def longs(xs: Long*) = new GenericArrayData(xs.toArray)
  private def strs(xs: Option[String]*) = new GenericArrayData(
    xs.map(_.map(UTF8String.fromString).orNull).toArray[Any])

  private val rnd = new scala.util.Random(42)

  test("long kernel: sorted-array fallback == open-addressing mainline") {
    val cases = Seq(
      (longs(), longs(1L, 2L)),
      (longs(0L, 0L, 5L), longs(0L, 5L, 5L, 7L)),
      (longs(1L, 2L, 3L), longs(4L, 5L)),
      (longs(Long.MinValue, -1L, 0L, Long.MaxValue),
        longs(Long.MaxValue, 0L, Long.MinValue))) ++
      (1 to 50).map { _ =>
        val n = rnd.nextInt(40)
        val m = rnd.nextInt(40)
        (longs(Seq.fill(n)(rnd.nextInt(25).toLong): _*),
          longs(Seq.fill(m)(rnd.nextInt(25).toLong): _*))
      }
    cases.foreach { case (a, b) =>
      val main = LongOverlapKernel.count(a, b)
      // the fallback's contract is (small, large) — mirror count()'s
      // orientation both ways to pin symmetry too
      val fb = LongOverlapKernel.countViaSortedArray(a, b)
      val fbSwap = LongOverlapKernel.countViaSortedArray(b, a)
      assert(fb == main && fbSwap == main,
        s"fallback $fb/$fbSwap != mainline $main")
    }
  }

  test("string kernel: sorted-array fallback == mainline incl. nulls") {
    val cases = Seq(
      (strs(), strs(Some("a"))),
      (strs(None, Some("a"), Some("a")), strs(Some("a"), None, None)),
      (strs(Some("x")), strs(None)),
      (strs(None), strs(None))) ++
      (1 to 50).map { _ =>
        def side = (0 until rnd.nextInt(30)).map { _ =>
          if (rnd.nextInt(10) == 0) None
          else Some(s"tok${rnd.nextInt(12)}")
        }
        (strs(side: _*), strs(side: _*))
      } ++
      (1 to 30).map { _ =>
        def side = (0 until rnd.nextInt(30)).map(_ =>
          Option.when(rnd.nextInt(8) != 0)(s"w${rnd.nextInt(18)}"))
        (strs(side: _*), strs(side: _*))
      }
    cases.foreach { case (a, b) =>
      val main = OverlapKernel.count(a, b)
      val fb = OverlapKernel.countViaSortedArray(a, b)
      val fbSwap = OverlapKernel.countViaSortedArray(b, a)
      assert(fb == main && fbSwap == main,
        s"fallback $fb/$fbSwap != mainline $main")
    }
  }
}
