package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.superstore.{CatalogDdl, WarehouseCache}

/** S8 round-trip: CREATE TABLE ... USING PARQUET LOCATION over the
  * materialized warehouse, then resolve through the catalog — listTables,
  * spark.table, and a catalog-name SQL join — and drop without touching
  * the data. */
class CatalogDdlSpec extends AnyFunSuite {
  import TestSpark.spark

  test("warehouse tables round-trip through the persistent catalog") {
    val wh = WarehouseCache.get(spark)
    CatalogDdl.createTables(spark, WarehouseCache.dir)
    try {
      val listed = spark.catalog.listTables(CatalogDdl.Database)
        .collect().map(_.name.toLowerCase).toSet
      assert(WarehouseCache.tableNames.map(_.toLowerCase).toSet.subsetOf(listed),
        s"catalog is missing tables: ${WarehouseCache.tableNames.map(_.toLowerCase).toSet -- listed}")

      assert(spark.table(s"${CatalogDdl.Database}.Orders").count() ==
        wh("Orders").count())

      // a real query through catalog names only
      val rows = spark.sql(
        s"""SELECT r.region_name, COUNT(*) AS n
            FROM ${CatalogDdl.Database}.State s
            JOIN ${CatalogDdl.Database}.Region r ON s.region_id = r.region_id
            GROUP BY r.region_name""").collect()
      assert(rows.length == 4)
      assert(rows.map(_.getLong(1)).sum == wh("State").count())
    } finally CatalogDdl.dropTables(spark)

    // external tables: dropping DDL must not delete the parquet
    assert(spark.read.parquet(s"${WarehouseCache.dir}/Orders").count() > 0)
  }
}
