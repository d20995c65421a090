package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Bucket-co-located persisted layout for the repeated lineitem⋈part join
  * family (q4/q9/q9b/q22/q27 — round 11, VERDICT r10 #5).
  *
  * At bench scale those queries broadcast the dimension and shuffle
  * nothing; past the broadcast budget (part is ~1 GB at sf30-equivalent
  * scale and grows with the data) every run re-shuffles BOTH sides on the
  * join key. That re-shuffle is a LAYOUT cost, not a query cost: the
  * standard 100 TB lever is to pay it once — persist both tables bucketed
  * by the join key with the same bucket count — after which every join in
  * the family reads co-located buckets and the planner inserts no
  * Exchange on either side (HashClusteredDistribution is satisfied by the
  * scan itself; BucketedLayoutSpec pins the plan).
  *
  * Mechanics: `bucketBy(n, key).sortBy(key)` via `saveAsTable` with an
  * explicit external path (bucket ids ride in the file names, data
  * outlives the in-memory catalog entry). The frame is pre-partitioned by
  * the SAME hash the bucketer applies (both are HashPartitioning /
  * Murmur3), so each write task holds exactly one bucket — ONE file per
  * bucket. The in-partition merge-join Sorts remain (Spark ≥3.0
  * propagates bucket sort order only behind the legacy
  * bucketedTableScan.outputOrdering conf, since multi-file buckets can't
  * be trusted sorted); the EXCHANGES — the term that scales with the
  * data — are gone, which is the point. A fresh JVM finds the `_bkt_ok`
  * marker and re-registers the existing files with `CREATE TABLE ...
  * CLUSTERED BY` DDL instead of rewriting.
  *
  * Bucket count is a layout-time choice: fixed here (content-addressed
  * with the directory), while a deployment sizes it so a bucket's share
  * of the FACT table stays a few hundred MB per task at target scale.
  */
object BucketedLayout {

  val Buckets = 32

  private def hash(seed: String, buckets: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed|$buckets".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)

  /** Generic single-table ensure: `table` bucketed+sorted by `key`,
    * content-addressed by (sfDir, table, key, buckets) — one source table
    * can have several bucketed copies under DIFFERENT keys (lineitem by
    * l_partkey for the partkey family, by l_orderkey for the orderkey
    * family); each is a distinct layout with its own address. Builds the
    * files once per config; re-registers only on a fresh catalog. */
  def ensureTable(s: SparkSession, sfDir: String, table: String,
                  key: String, buckets: Int = Buckets): String = synchronized {
    val h = hash(s"$sfDir|$table|$key", buckets)
    val name = s"graft_${table}_bkt_$h"
    if (!s.catalog.tableExists(name)) {
      val loc = s"/root/repo/target/bucketed/$h/$table"
      val marker = Paths.get(s"$loc/_bkt_ok")
      if (Files.exists(marker)) {
        // files already on disk from a previous JVM: register only
        val ddl = s.read.parquet(loc).schema.toDDL
        s.sql(s"""CREATE TABLE $name ($ddl) USING PARQUET
                  CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
                  LOCATION '$loc'""")
      } else {
        graft.Tables.table(s, sfDir, table)
          // pre-cluster by the bucketer's own hash → one bucket per
          // task → one file per bucket (tasks×buckets files otherwise,
          // the partitionBy lesson applied to bucketing)
          .repartition(buckets, col(key))
          .write.mode("overwrite")
          .bucketBy(buckets, key).sortBy(key)
          .option("path", loc)
          .saveAsTable(name)
        Files.writeString(marker, "ok")
      }
    }
    name
  }

  /** Ensure the (lineitem, part) pair for `sfDir` exists bucketed by the
    * partkey; returns the catalog table names. */
  def ensure(s: SparkSession, sfDir: String,
             buckets: Int = Buckets): (String, String) =
    (ensureTable(s, sfDir, "lineitem", "l_partkey", buckets),
     ensureTable(s, sfDir, "part", "p_partkey", buckets))

  /** Ensure the (lineitem, orders) pair for `sfDir` exists bucketed by the
    * ORDER key — the second join/agg family's co-location (q2/q6/q19/q20/
    * q28 all shuffle lineitem and/or orders on the orderkey; see
    * Relational.liOrdersBucketed for the gate). */
  def ensureOrderkey(s: SparkSession, sfDir: String,
                     buckets: Int = Buckets): (String, String) =
    (ensureTable(s, sfDir, "lineitem", "l_orderkey", buckets),
     ensureTable(s, sfDir, "orders", "o_orderkey", buckets))
}
