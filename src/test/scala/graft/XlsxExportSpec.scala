package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.superstore.{Exporter, WarehouseCache}

/** S6 xlsx export round-trip: write the workbook with the zero-dependency
  * writer, extract it with the SAME stdlib tool
  * (tools/extract_xlsx.py) that produced the golden fixtures from the
  * reference's export, and compare the extracted cells against the
  * warehouse tables. */
class XlsxExportSpec extends AnyFunSuite {
  import TestSpark.spark

  test("xlsx workbook round-trips through the stdlib extractor") {
    val wh = WarehouseCache.get(spark)
    val dir = Files.createTempDirectory("graft_xlsx").toString
    val xlsx = s"$dir/superstore_dw_export.xlsx"
    Exporter.exportXlsx(wh, xlsx)

    val proc = new ProcessBuilder("python3", "tools/extract_xlsx.py", xlsx,
      s"$dir/csv").redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes())
    assert(proc.waitFor() == 0, s"extractor failed:\n$out")

    // every sheet present with the right shape
    WarehouseCache.tableNames.foreach { t =>
      val got = spark.read.option("header", "true").option("escape", "\"")
        .csv(s"$dir/csv/$t.csv")
      assert(got.columns.sorted.toSeq == wh(t).columns.sorted.toSeq,
        s"$t columns differ")
      assert(got.count() == wh(t).count(), s"$t row count differs")
    }

    // cell-exact on two typed tables (id int, strings, decimal measures)
    Seq("Region", "State").foreach { t =>
      val expected = wh(t).collect()
        .map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("")).mkString("|"))
        .sorted
      val got = spark.read.option("header", "true").option("escape", "\"")
        .csv(s"$dir/csv/$t.csv")
        .select(wh(t).columns.map(org.apache.spark.sql.functions.col): _*)
        .collect()
        .map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("")).mkString("|"))
        .sorted
      assert(got.toSeq == expected.toSeq, s"$t cells differ")
    }

    // numeric fidelity: Orders sales survive the round trip exactly
    val salesCol = org.apache.spark.sql.functions.col("sales_order")
    val whSum = wh("Orders").agg(org.apache.spark.sql.functions.sum(salesCol))
      .head().getDecimal(0)
    val csvSum = spark.read.option("header", "true").csv(s"$dir/csv/Orders.csv")
      .agg(org.apache.spark.sql.functions.sum(
        salesCol.cast(org.apache.spark.sql.types.DecimalType(18, 2))))
      .head().getDecimal(0)
    assert(whSum.compareTo(csvSum) == 0, s"Orders sales drift: $whSum vs $csvSum")
  }
}
