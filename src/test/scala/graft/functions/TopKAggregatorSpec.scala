package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The bounded top-k aggregator must equal the naive sort-take answer on
  * any input, through the real reduce+merge path (multi-partition
  * Dataset aggregation exercises both). Guards the O(1)-reject / O(k)-
  * insert rewrite of reduce(). */
class TopKAggregatorSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("aggregator top-k equals sort-take top-k for random groups") {
    import spark.implicits._
    val eventGen = for {
      user <- Gen.chooseNum(1L, 4L)
      id <- Gen.chooseNum(1L, 10000L)
      v <- Gen.chooseNum(-100, 100).map(_ / 7.0)
    } yield UserEvent(user, id, v)

    val prop = Prop.forAll(Gen.listOfN(60, eventGen)) { events =>
      // distinct event ids per user: ties on (value, event_id) would make
      // the expected answer ambiguous
      val data = events.groupBy(e => (e.user_id, e.event_id))
        .map(_._2.head).toSeq
      val k = 5
      val got = data.toDS().repartition(4)
        .groupByKey(_.user_id)
        .agg(new TopKByValue(k).toColumn)
        .collect().toMap
        .map { case (u, buf) => u -> buf.items.map(_.event_id) }
      val expected = data.groupBy(_.user_id).map { case (u, es) =>
        u -> es.sortBy(e => (-e.value, e.event_id)).take(k)
          .map(e => e.event_id)
      }
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    withClue(result.status.toString) { result.passed shouldBe true }
  }
}
