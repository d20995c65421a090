package graft.superstore

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse export + reject-quarantine utilities.
  *
  * Exporter = the reference's generate_excel.py (S4–S6): iterate the
  * catalog, dump every table. Engine-side the export is per-table columnar
  * or CSV files (xlsx is a driver-side presentation concern, out of engine
  * scope — SURVEY.md §2.1 S6).
  *
  * Quarantine = the reference's "Not Found → Errors.txt" design (S9,
  * Diagrams/AllTablesETLDesign.drawio; code logs+skips at etl.py:489-496):
  * the anti-join complement of each fact's dimension lookups, persisted so
  * rejects are auditable instead of silently dropped.
  */
object Exporter {

  /** S4/S5/S6 — export every registered warehouse table under `outDir`
    * in the given format (parquet | csv | orc | json). `singleFile`
    * coalesces each table to one file — right for the small dimension/
    * aggregate tables this mirrors from generate_excel.py; leave it off
    * for large facts (a single write task would serialize the export). */
  def exportAll(wh: Map[String, DataFrame], outDir: String,
                format: String = "csv", singleFile: Boolean = true): Unit =
    wh.foreach { case (name, df) =>
      val base = if (singleFile) df.coalesce(1) else df
      val w = base.write.mode("overwrite")
      (if (format == "csv") w.option("header", "true") else w)
        .format(format).save(s"$outDir/$name")
    }

  /** S9 — rows of the processed frame whose Item-fact dimension lookups
    * would miss (left-anti of each lookup), tagged with the failing
    * dimension. Empty on well-formed input; nonempty input lands in
    * `outDir` for audit. */
  def itemRejects(pre: DataFrame, customer: DataFrame, product: DataFrame,
                  calendar: DataFrame, location: DataFrame): DataFrame = {
    def miss(dim: DataFrame, cond: org.apache.spark.sql.Column, tag: String) =
      pre.join(broadcast(dim), cond, "left_anti")
        .select(col("Row ID").as("row_id"), col("Order ID").as("order_code"),
                lit(tag).as("missing_dimension"))
    miss(customer.select("customer_code"),
         col("Customer ID") === col("customer_code"), "Customer")
      .unionByName(miss(product.select("product_code").distinct(),
         col("Product ID") === col("product_code"), "Product"))
      .unionByName(miss(calendar.select("full_date"),
         col("Order Date") === col("full_date"), "Calendar"))
      .unionByName(miss(location.select("postal_code", "city_name").distinct(),
         col("Postal Code") === col("postal_code") &&
           col("City") === col("city_name"), "Location"))
  }

  /** Physical layout for the big facts at scale (SURVEY.md §4): partition
    * Item by order year (derived through its Calendar FK) so year-ranged
    * queries prune whole directories at the scan. Dimensions stay
    * unpartitioned. At 100 TB the same layout applies per fact; year (or
    * year-month) keeps partition counts bounded and file sizes healthy. */
  def persistItemPartitioned(item: DataFrame, calendar: DataFrame,
                             outDir: String): Unit =
    item
      .join(broadcast(calendar.select(col("calendar_id"), col("year_number"))),
            "calendar_id")
      .withColumnRenamed("year_number", "order_year")
      .write.mode("overwrite")
      .partitionBy("order_year")
      .parquet(s"$outDir/Item_by_year")

  /** Persist rejects (the Errors.txt analog) and return the count —
    * written first, counted from the written files, so the anti-joins
    * run once. */
  def quarantine(rejects: DataFrame, outDir: String): Long = {
    rejects.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/rejects")
    rejects.sparkSession.read.option("header", "true")
      .csv(s"$outDir/rejects").count()
  }
}
