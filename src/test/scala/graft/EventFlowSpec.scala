package graft

import java.sql.Timestamp

import graft.operators.EventFlow

/** Hand-computed oracles for the event-transition operator. */
class EventFlowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def fixture = Seq(
    // user 1: a -> b -> a -> b
    (1L, ts(10), 1L, "a"), (2L, ts(20), 1L, "b"),
    (3L, ts(30), 1L, "a"), (4L, ts(40), 1L, "b"),
    // user 2: a -> b -> c
    (5L, ts(10), 2L, "a"), (6L, ts(20), 2L, "b"), (7L, ts(30), 2L, "c"))
    .toDF("event_id", "ts", "user_id", "event_type")

  test("transition counts follow per-user time order") {
    val r = EventFlow.transitions(fixture, "user_id", "ts", "event_type", "event_id")
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    // a->b ×3 (two from user 1, one from user 2); b->a ×1; b->c ×1
    assert(r == Map(("a", "b") -> 3L, ("b", "a") -> 1L, ("b", "c") -> 1L))
  }

  test("conditional probability uses the prev-type marginal") {
    val r = EventFlow.transitions(fixture, "user_id", "ts", "event_type", "event_id")
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getDouble(3))).toMap
    assert(r(("a", "b")) == 1.0)    // every a is followed by b
    assert(r(("b", "a")) == 0.5)    // b splits between a and c
    assert(r(("b", "c")) == 0.5)
  }

  test("PMI matches the closed form") {
    val r = EventFlow.transitions(fixture, "user_id", "ts", "event_type", "event_id")
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getDouble(4))).toMap
    // T=5; a->b: n=3, out(a)=3, in(b)=3 -> ln(3*5/9)
    assert(math.abs(r(("a", "b")) - math.log(15.0 / 9.0)) < 1e-5)
    // b->c: n=1, out(b)=2, in(c)=1 -> ln(5/2)
    assert(math.abs(r(("b", "c")) - math.log(2.5)) < 1e-5)
  }

  test("no cross-user transitions leak") {
    // single-event users produce no pairs
    val solo = Seq(
      (1L, ts(10), 1L, "a"), (2L, ts(99), 2L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    assert(EventFlow.transitions(solo, "user_id", "ts", "event_type", "event_id")
      .count() == 0L)
  }

  test("equal timestamps break ties on the event id") {
    val tied = Seq(
      (2L, ts(10), 1L, "b"), (1L, ts(10), 1L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = EventFlow.transitions(tied, "user_id", "ts", "event_type", "event_id")
      .collect().map(x => (x.getString(0), x.getString(1)))
    assert(r.toSeq == Seq(("a", "b"))) // id 1 sorts first
  }

  test("result is partitioning-independent") {
    val one = EventFlow.transitions(fixture, "user_id", "ts", "event_type", "event_id")
      .orderBy("prev_type", "next_type").collect().toSeq
    val many = EventFlow.transitions(
      fixture.repartition(7), "user_id", "ts", "event_type", "event_id")
      .orderBy("prev_type", "next_type").collect().toSeq
    assert(one == many)
  }

  test("registered query produces a bounded matrix on the fixture") {
    val r = Queries.all("q_event_transitions")(spark, "/root/testdata/sf0.001")
    val n = r.count()
    assert(n > 0 && n <= 25L, s"5 event types bound the matrix at 25, got $n")
    val ps = r.select("p_cond").as[Double].collect()
    assert(ps.forall(p => p > 0.0 && p <= 1.0))
  }
}
