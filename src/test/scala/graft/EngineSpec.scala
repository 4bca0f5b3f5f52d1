package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{Engine, Registry}

/** SQL facade parity: the same query through spark.sql over registered
  * views and through the DataFrame registry must agree row-for-row.
  */
class EngineSpec extends AnyFunSuite with TestSpark {
  private val sf = "/root/testdata/sf0.001"

  test("q16 TPC-H Q1 shape: SQL path == DataFrame path") {
    val viaSql = Engine.sql(spark, sf,
      """SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               COUNT(*) AS n
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""").collect().toSeq
    val viaDf = Registry.queries("q16_tpch_q1")(spark, sf).collect().toSeq
    assert(viaSql == viaDf)
  }

  test("q17 broadcast dim join: SQL path == DataFrame path") {
    val viaSql = Engine.sql(spark, sf,
      """SELECT n_name, COUNT(*) AS n FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""").collect().toSeq
    val viaDf = Registry.queries("q17_join_agg")(spark, sf).collect().toSeq
    assert(viaSql == viaDf)
  }

  test("events view exposes a usable timestamp despite nanos storage") {
    val r = Engine.sql(spark, sf,
      "SELECT COUNT(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .head()
    assert(r.getLong(0) > 0)
  }
}
