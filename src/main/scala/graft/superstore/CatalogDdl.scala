package graft.superstore

import org.apache.spark.sql.SparkSession

/** S8 — persistent-catalog DDL, the analog of the reference's
  * `setup_database.sql:1-196` (CREATE DATABASE + 15 CREATE TABLEs).
  *
  * The reference bootstraps a MySQL schema the ETL then fills; here the
  * ETL writes parquet ([[WarehouseCache]] / [[Exporter]]) and this module
  * registers each table in Spark's catalog with
  * `CREATE TABLE ... USING PARQUET LOCATION`, so the SQL surface resolves
  * warehouse tables by catalog name (`spark.table`, `spark.sql`) instead
  * of session temp views. External-location tables keep DDL and data
  * lifecycle separate — dropping the catalog entry never deletes data,
  * matching warehouse practice at scale (the same statements run
  * unchanged against a Hive metastore or any V2 catalog).
  */
object CatalogDdl {
  val Database = "superstore"

  /** Register every warehouse table under `whDir` in database [[Database]].
    * Idempotent. */
  def createTables(spark: SparkSession, whDir: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
    WarehouseCache.tableNames.foreach { t =>
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $Database.$t USING PARQUET LOCATION '$whDir/$t'")
    }
  }

  /** Drop the catalog entries (external tables — data stays in place). */
  def dropTables(spark: SparkSession): Unit = {
    WarehouseCache.tableNames.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $Database.$t")
    }
    spark.sql(s"DROP DATABASE IF EXISTS $Database")
  }
}
