package graft

import graft.incremental.Scheduler
import graft.sources.PagedSource
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import java.time.{Instant, LocalTime}

/** Property tests over the engine's pure arithmetic (no Spark session):
  * scheduler slot math and source slice planning — the two places where
  * an off-by-one silently loses or double-reads data.
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val genTime: Gen[LocalTime] =
    Gen.chooseNum(0, 24 * 3600 - 1).map(LocalTime.ofSecondOfDay(_))
  private val genSchedule: Gen[List[LocalTime]] =
    Gen.nonEmptyListOf(genTime).map(_.distinct)
  private val genInstant: Gen[Instant] =
    Gen.chooseNum(0L, 4102444800L).map(Instant.ofEpochSecond)

  test("WordShingles.compute == sliding-window reference for any words") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val genWord: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.const(""),                       // empty token
      Gen.const("xin chào"),               // embedded space + multi-byte
      Gen.const("界"))                     // multi-byte only
    check(Prop.forAll(Gen.listOf(genWord), Gen.chooseNum(1, 4)) { (ws, n) =>
      val arr = new GenericArrayData(
        ws.map(w => UTF8String.fromString(w): Any).toArray)
      val got = graft.functions.expressions.WordShingles.compute(arr, n)
      val expect =
        if (ws.length < n) Seq.empty[String]
        else ws.sliding(n).map(_.mkString(" ")).toSeq
      val gotStrs = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      gotStrs == expect
    })
    // Null element → null result (the expression's null contract).
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null))
    assert(graft.functions.expressions.WordShingles.compute(withNull, 2) == null)
  }

  test("nextScheduled is strictly future; previousOrCurrent is at-or-before") {
    check(Prop.forAll(genInstant, genSchedule) { (base, sched) =>
      val next = Scheduler.nextScheduled(base, sched)
      val prev = Scheduler.previousOrCurrentScheduled(base, sched)
      next.isAfter(base) && !prev.isAfter(base)
    })
  }

  test("adjacent slots: no schedule point lies strictly between prev and next") {
    check(Prop.forAll(genInstant, genSchedule) { (base, sched) =>
      val next = Scheduler.nextScheduled(base, sched)
      val prev = Scheduler.previousOrCurrentScheduled(base, sched)
      // every scheduled instant around base is outside (prev, next)
      val day = java.time.ZonedDateTime.ofInstant(base, java.time.ZoneOffset.UTC)
      (-1 to 1).forall { d =>
        sched.forall { t =>
          val inst = day.toLocalDate.plusDays(d.toLong)
            .atTime(t).toInstant(java.time.ZoneOffset.UTC)
          !(inst.isAfter(prev) && inst.isBefore(next)) ||
            (inst.isAfter(base) && !inst.isBefore(next)) || inst == next
        }
      }
    })
  }

  test("planSlices tiles (cutoff, now] exactly: disjoint, adjacent, newest-first") {
    val gen = for {
      cutoff <- Gen.chooseNum(0L, 1000000L)
      span <- Gen.chooseNum(0L, 500000L)
      slice <- Gen.chooseNum(1L, 100000L)
    } yield (cutoff, cutoff + span, slice)
    check(Prop.forAll(gen) { case (cutoff, now, slice) =>
      val slices = PagedSource.planSlices(cutoff, now, slice)
      val coversAll = if (now > cutoff)
        slices.last._1 == cutoff && slices.head._2 == now
      else slices.isEmpty
      val adjacent = slices.sliding(2).forall {
        case Seq((lo1, _), (_, hi2)) => lo1 == hi2
        case _ => true
      }
      val ordered = slices.forall { case (lo, hi) => lo < hi }
      coversAll && adjacent && ordered
    })
  }

  test("cutoffMs: overlap never moves the cutoff forward") {
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2),
      Gen.chooseNum(0L, 1000000L)) { (ck, overlap) =>
      Scheduler.cutoffMs(Some(ck), 0L, overlap, 30) <= ck
    })
  }

  test("sampling hexThreshold: monotone in the fraction, 4 hex chars, ordered compare") {
    import graft.operators.Sampling
    check(Prop.forAll(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val (tl, th) = (Sampling.hexThreshold(lo), Sampling.hexThreshold(hi))
      tl.length == 4 && th.length == 4 &&
        tl.forall("0123456789abcdef".contains(_)) &&
        tl <= th // lexicographic order == numeric order for fixed-width hex
    })
  }

  test("sampling split thresholds cut a uniform hex population at the right fraction") {
    import graft.operators.Sampling
    // All 65536 possible 4-hex buckets: the selected share under a
    // threshold equals round(frac * 65536) exactly (no Spark needed —
    // membership is a pure string compare).
    val all = (0 until 65536).map(i => f"$i%04x")
    check(Prop.forAll(Gen.chooseNum(0.0, 0.999)) { frac =>
      val t = Sampling.hexThreshold(frac)
      val selected = all.count(_ < t)
      selected == math.round(frac * 65536).toInt.min(65535)
    })
  }

  test("jaro_winkler byte and char kernels == one straight reference") {
    import org.apache.spark.unsafe.types.UTF8String
    // Single-kernel reference (the pre-optimization formulation): the
    // ASCII byte kernel and the multi-byte char kernel must both
    // reproduce it exactly — the guard on the dual-kernel split.
    def ref(s1: String, s2: String): Double = {
      val l1 = s1.length; val l2 = s2.length
      if (l1 == 0 || l2 == 0) return 0.0
      if (s1 == s2) return 1.0
      val window = math.max(0, math.max(l1, l2) / 2 - 1)
      val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
      var matches = 0
      for (i <- 0 until l1) {
        var j = math.max(0, i - window)
        var done = false
        while (j <= math.min(l2 - 1, i + window) && !done) {
          if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
            m1(i) = true; m2(j) = true; matches += 1; done = true
          }
          j += 1
        }
      }
      if (matches == 0) return 0.0
      var trans = 0; var k = 0
      for (i <- 0 until l1) if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) trans += 1
        k += 1
      }
      val m = matches.toDouble
      val jaro = (m / l1 + m / l2 + (m - trans / 2) / m) / 3.0
      if (jaro <= 0.7) return jaro
      var p = 0
      while (p < math.min(4, math.min(l1, l2)) &&
        s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
    val genStr: Gen[String] = Gen.oneOf(
      Gen.stringOf(Gen.alphaChar).map(_.take(20)),        // ASCII path
      Gen.stringOf(Gen.oneOf('a', 'b', 'é', 'ü', '界'))   // char path
        .map(_.take(12)),
      Gen.const(""))
    check(Prop.forAll(genStr, genStr) { (a, b) =>
      graft.functions.expressions.JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b)) == ref(a, b)
    })
  }
}
