package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Advanced

/** q176 SCD2 state-history semantics on planted sequences: run
  * collapsing, interval chaining (valid_to == next valid_from), the open
  * live interval, tie-breaking on event_id, and single-partition-free
  * plan shape.
  */
class StateHistorySpec extends AnyFunSuite with TestSpark {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType)))

  private def ts(s: String) = Timestamp.valueOf(s)

  /** user 1: A A B A (4 events -> 3 runs); user 2: single event;
    * user 3: two same-ts events disambiguated by event_id (B then A by
    * id order -> 2 runs). */
  private lazy val events = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, ts("2024-01-01 10:00:00"), 1L, "A"),
      Row(2L, ts("2024-01-01 10:05:00"), 1L, "A"),
      Row(3L, ts("2024-01-01 10:10:00"), 1L, "B"),
      Row(4L, ts("2024-01-01 10:20:00"), 1L, "A"),
      Row(5L, ts("2024-01-01 09:00:00"), 2L, "C"),
      Row(6L, ts("2024-01-01 08:00:00"), 3L, "B"),
      Row(7L, ts("2024-01-01 08:00:00"), 3L, "A")), 2),
    schema)

  private lazy val hist = Advanced.stateHistory(events)
    .orderBy("user_id", "valid_from")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2),
      Option(r.getString(3)), r.getLong(4)))

  test("consecutive same-state runs collapse with counts") {
    val u1 = hist.filter(_._1 == 1L)
    assert(u1.map(x => (x._2, x._5)).toSeq == Seq(("A", 2L), ("B", 1L), ("A", 1L)))
  }

  test("intervals chain: valid_to equals the next run's valid_from; last is open") {
    val u1 = hist.filter(_._1 == 1L)
    assert(u1.init.zip(u1.tail).forall { case (a, b) => a._4.contains(b._3) })
    assert(u1.last._4.isEmpty)
    // singleton user: one open interval
    val u2 = hist.filter(_._1 == 2L)
    assert(u2.length == 1 && u2.head._4.isEmpty && u2.head._5 == 1L)
  }

  test("same-ts events break ties by event_id") {
    val u3 = hist.filter(_._1 == 3L)
    assert(u3.map(_._2).toSeq == Seq("B", "A"))
  }

  test("plan rides one user-keyed exchange (no global-order window)") {
    val plan = Advanced.stateHistory(events).queryExecution.executedPlan.toString
    // every Window/Sort partitions by user_id; a missing partitionBy
    // would surface as a SinglePartition exchange
    assert(!plan.contains("SinglePartition"), s"global window in plan:\n$plan")
  }

  test("statePitJoin: cold start NULLs, run-start since, same-instant " +
      "smaller-id state visible, later runs picked") {
    // user 1: A(10:00) A(10:05) purchase(10:07) B(10:10) purchase(10:12)
    //   -> first purchase sees run A since 10:00; second sees B since 10:10
    // user 2: purchase(09:00) before any state -> NULL state/since
    // user 3: state A and purchase at the SAME ts, state id smaller ->
    //   the purchase sees A
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, ts("2024-01-01 10:00:00"), 1L, "A"),
        Row(2L, ts("2024-01-01 10:05:00"), 1L, "A"),
        Row(3L, ts("2024-01-01 10:07:00"), 1L, "purchase"),
        Row(4L, ts("2024-01-01 10:10:00"), 1L, "B"),
        Row(5L, ts("2024-01-01 10:12:00"), 1L, "purchase"),
        Row(6L, ts("2024-01-01 09:00:00"), 2L, "purchase"),
        Row(7L, ts("2024-01-01 11:00:00"), 3L, "A"),
        Row(8L, ts("2024-01-01 11:00:00"), 3L, "purchase"))),
      schema)
    val out = Advanced.statePitJoin(df, "purchase").collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(3)),
        Option(r.getString(4))))).toMap
    assert(out(3L) == ((Some("A"), Some("2024-01-01 10:00:00.000000"))))
    assert(out(5L) == ((Some("B"), Some("2024-01-01 10:10:00.000000"))))
    assert(out(6L) == ((None, None)))
    assert(out(8L) == ((Some("A"), Some("2024-01-01 11:00:00.000000"))))
    assert(out.size == 4)
  }
}
