package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.operators.{Relational, TextOps, PipelineOps, VectorOps, Warehouse, Multimodal}
import graft.superstore.{Queries13, WarehouseCache}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 (plus the
  * large-scale pipeline operators) to a DataFrame program over the testdata
  * star; `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * correctness gate. Column names and row order are aligned pairwise.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-hop star join: orders⋈customer⋈nation⋈region revenue rollup. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5_region_revenue(spark, "/root/testdata/sf0.001")

  /** Warehouse money columns are exact DECIMAL (MySQL storage parity);
    * the gate boundary emits them as doubles — one correctly-rounded
    * conversion, identical in Spark and DuckDB (Num discipline). */
  private def decimalsToDouble(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast(DoubleType).as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)

  /** The reference's 13-query workload over the Spark-built warehouse
    * (fixed-size reference data — sfDir is ignored; the warehouse is
    * materialized once per session by WarehouseCache). */
  def ssQueries: Map[String, (SparkSession, String) => DataFrame] =
    Queries13.queries.map { case (name, wq) =>
      name -> ((s: SparkSession, _: String) =>
        decimalsToDouble(wq(WarehouseCache.get(s))))
    }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ PipelineOps.queries ++
      VectorOps.queries ++ Warehouse.queries ++ Multimodal.queries ++
      ssQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    * The `ss_*` oracles carry a `__WH__` placeholder that Verify replaces
    * with the materialized warehouse path. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ PipelineOps.oracles ++
      VectorOps.oracles ++ Warehouse.oracles ++ Multimodal.oracles ++
      Queries13.duckOracles
}
