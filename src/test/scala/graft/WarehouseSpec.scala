package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Warehouse

class WarehouseSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("every warehouse query returns rows") {
    Warehouse.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("q27 cumulative revenue is nondecreasing within each brand") {
    val w = Window.partitionBy("p_brand").orderBy("year_number", "month_number")
    val bad = Warehouse.q27_product_performance(spark, sf)
      .withColumn("prev", lag("cumulative_revenue", 1).over(w))
      .filter(col("prev").isNotNull && col("cumulative_revenue") < col("prev") - 1e-9)
      .count()
    assert(bad == 0)
  }

  test("q25 sessionization conserves events and has nonnegative durations") {
    val sessions = Warehouse.q25_events_sessionize(spark, sf)
    val nEvents = sessions.agg(sum("n_events")).head().getLong(0)
    assert(nEvents == Tables.events(spark, sf).count())
    assert(sessions.filter(col("duration_sec") < 0).count() == 0)
    assert(sessions.filter(col("session_end") < col("session_start")).count() == 0)
  }

  test("q26 monthly fact totals reconcile with raw orders") {
    val fact = Warehouse.q26_order_month(spark, sf)
      .agg(sum("total_sales"), sum("n_orders")).head()
    val raw = Tables.orders(spark, sf)
      .agg(sum("o_totalprice"), count(lit(1))).head()
    assert(math.abs(fact.getDouble(0) - raw.getDouble(0)) < 1e-4)
    assert(fact.getLong(1) == raw.getLong(1))
  }
}
