package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators.{Relational, TextOps, VectorOps, Warehouse, Multimodal}

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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ VectorOps.queries ++
      Warehouse.queries ++ Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ VectorOps.oracles ++
      Warehouse.oracles ++ Multimodal.oracles
}
