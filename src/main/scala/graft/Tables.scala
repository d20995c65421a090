package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated TPC-H-ish star at /root/testdata/sf*.
  *
  * All readers are plain parquet scans: schema comes from the files, filters
  * and column pruning are pushed to the scan by Catalyst (verify with
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`).
  */
object Tables {
  /** Resolved-scan cache, keyed by (session, path): `spark.read.parquet`
    * builds a fresh InMemoryFileIndex (directory listing) and re-reads the
    * parquet footer for schema on every call, which at 58 queries × 2–3
    * tables each is pure fixed overhead. A real deployment registers tables
    * once in a catalog and gets this caching for free; the cached DataFrame
    * here is the same thing — the analyzed scan relation is immutable and
    * every query plans on top of it. */
  private val scans =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    scans.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => s.read.parquet(p) })

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects by default. Read nanos as long and rebuild a (µs)
    * TimestampType column — same truncation DuckDB applies to ns. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Numeric discipline for oracle-exact results.
  *
  * The driver compares our parquet output against DuckDB by value hash, so
  * float summation order must not leak into results. Money columns in the
  * test data carry exactly 2 decimal digits: cast to DECIMAL before
  * aggregating (decimal arithmetic is exact in both Spark and DuckDB), and
  * cast the exact decimal sum to DOUBLE only at the output boundary — the
  * decimal→double conversion is IEEE-correctly-rounded and therefore
  * identical in both engines. At 100 TB the same discipline holds: Spark's
  * decimal sum uses partial aggregation (map-side combine) like any sum.
  */
object Num {
  val D18_2: DecimalType = DecimalType(18, 2)
  val D18_4: DecimalType = DecimalType(18, 4)

  /** Exact money representation (2 decimal digits). */
  def money(c: Column): Column = c.cast(D18_2)

  /** Exact decimal sum emitted as a deterministic double. */
  def dsum(c: Column): Column = sum(c).cast(DoubleType)
}
