package graft.superstore

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized warehouse for the SparkEntry `ss_*` queries.
  *
  * On first access per session the full Superstore ETL
  * ([[SuperstoreETL.build]], cell-level-parity-tested against the reference
  * export) runs once and every table is written to parquet under [[dir]];
  * the returned map holds plain parquet scans over that output. Downstream
  * queries therefore plan against ordinary file relations — the realistic
  * deployment shape (ETL job writes the warehouse, query layer reads it) —
  * and the driver's DuckDB oracle can read the very same files, which is
  * what makes the 13-query reference workload hash-attestable.
  *
  * `graft.wh.dir` (set by [[graft.Verify]] to a sibling of its output dir)
  * overrides the location so the oracle SQL's absolute `read_parquet`
  * paths stay valid when the driver later replays them in DuckDB.
  */
object WarehouseCache {
  val CsvPath = "/root/reference/Sample - Superstore.csv"

  val tableNames: Seq[String] = Seq("Calendar", "CalendarMonth", "Category",
    "Customer", "Item", "Location", "OrderM", "Orders", "Product",
    "ProductPerformance", "Region", "Shipping", "ShippingBehavior",
    "ShippingBehaviorS", "State")

  def dir: String = sys.props.getOrElse("graft.wh.dir",
    s"${System.getProperty("java.io.tmpdir")}/graft_wh")

  private val cache =
    new ConcurrentHashMap[(SparkSession, String), Map[String, DataFrame]]

  def get(spark: SparkSession): Map[String, DataFrame] =
    cache.computeIfAbsent((spark, dir), { case (s, d) =>
      val built = SuperstoreETL.build(s, CsvPath)
      tableNames.foreach { t =>
        built(t).coalesce(1).write.mode("overwrite").parquet(s"$d/$t")
      }
      tableNames.map(t => t -> s.read.parquet(s"$d/$t")).toMap
    })
}
