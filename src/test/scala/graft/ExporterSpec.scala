package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.superstore.{SuperstoreETL, Exporter}

class ExporterSpec extends AnyFunSuite {
  import TestSpark.spark

  private val csv = "/root/reference/Sample - Superstore.csv"

  test("csv export round-trips a dimension table") {
    val wh = SuperstoreETL.build(spark, csv)
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    Exporter.exportAll(Map("Region" -> wh("Region"), "Shipping" -> wh("Shipping")), dir)
    val back = spark.read.option("header", "true").csv(s"$dir/Region")
    assert(back.count() == 4)
    assert(back.columns.toSet == wh("Region").columns.toSet)
  }

  test("orc export round-trips with schema intact") {
    val wh = SuperstoreETL.build(spark, csv)
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    Exporter.exportAll(Map("Shipping" -> wh("Shipping")), dir, format = "orc")
    val back = spark.read.orc(s"$dir/Shipping")
    assert(back.count() == 4)
    // nullability flags are not preserved by the format round-trip
    assert(back.schema.map(f => (f.name, f.dataType)) ==
           wh("Shipping").schema.map(f => (f.name, f.dataType)))
  }

  test("year-partitioned Item layout prunes partitions at the scan") {
    val wh = SuperstoreETL.build(spark, csv)
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Exporter.persistItemPartitioned(wh("Item"), wh("Calendar"), dir)
    val back = spark.read.parquet(s"$dir/Item_by_year")
    val one = back.filter(col("order_year") === 2016)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("order_year"),
      s"expected partition pruning in plan:\n${plan.take(800)}")
    // pruned read returns exactly the 2016 slice
    val expected = wh("Item")
      .join(wh("Calendar").select(col("calendar_id"), col("year_number")), "calendar_id")
      .filter(col("year_number") === 2016).count()
    assert(one.count() == expected)
  }

  test("well-formed input produces zero rejects; a doctored row is quarantined") {
    val pre = SuperstoreETL.preprocess(SuperstoreETL.readRaw(spark, csv))
    val (calendar, _) = SuperstoreETL.calendarDims(pre)
    val customer = SuperstoreETL.customerDim(pre)
    val (_, _, location) = SuperstoreETL.geographyDims(pre)
    val (_, product) = SuperstoreETL.productDims(pre)

    assert(Exporter.itemRejects(pre, customer, product, calendar, location).count() == 0)

    // doctor one row: unknown customer code → exactly one Customer reject
    val doctored = pre.withColumn("Customer ID",
      when(col("Row ID") === 1, lit("ZZ-99999")).otherwise(col("Customer ID")))
    val rej = Exporter.itemRejects(doctored, customer, product, calendar, location)
    val rows = rej.collect()
    assert(rows.length == 1)
    assert(rows.head.getString(2) == "Customer")
    assert(rows.head.getInt(0) == 1)
  }
}
