package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Hilbert-curve clustered layout — the k-dimensional generalization of
  * [[ZOrderLayout]] (which is 2-dim by construction: a 16+16 bit Morton
  * interleave). A workload slicing on THREE independent dimensions needs
  * footer stats selective on all three at once; with the Morton ladder
  * that means either widening the interleave (straightforward) or moving
  * to the Hilbert curve (this module): at equal bits the Hilbert curve's
  * unit-step adjacency keeps each contiguous key range — each output
  * file — a tighter box of the key space, because the curve never takes
  * Morton's bit-boundary jumps. Same consumption story as z-order: plain
  * parquet, ordinary footer min/max row-group skipping, a cluster
  * catalog's file-level pruning; no table format required.
  *
  * The curve value is LAYOUT-ONLY (ordered by, then dropped); q77's
  * oracle runs the identical slice on the PLAIN table, pinning
  * value-faithfulness exactly like q73/q74.
  */
object HilbertLayout {

  /** Algorithm tag, part of the content address (the BuildTag lesson). */
  val Tag = "h1"

  /** Bits per dimension: 3 dims × 16 bits = 48-bit index, comfortably a
    * long; 65k cells per axis is far finer than any file count. */
  val BitsPerDim = 16

  /** `bits`-bit rank of `c` within [lo, hi] — ZOrderLayout.rank16
    * generalized (the double intermediate affects row PLACEMENT only). */
  private def rank(c: Column, lo: Long, hi: Long, bits: Int): Column =
    if (hi <= lo) lit(0L)
    else ((c - lit(lo)).cast(DoubleType) *
          (((1L << bits) - 1).toDouble / (hi - lo).toDouble)).cast(LongType)

  /** Write `df` Hilbert-clustered on the (long-valued) dimension columns:
    * one tiny bounds agg, rank each dim, range-partition by the curve
    * index so each output file covers one contiguous curve range = one
    * tight box of the k-dim space, sort within for row-group stats, drop
    * the key. Timestamps forced to stats-bearing TIMESTAMP_MICROS for
    * this write (the layout IS those stats), as in ZOrderLayout. */
  def writeHilbert(df: DataFrame, dims: Seq[Column], out: String,
                   files: Int): Unit = {
    graft.functions.HilbertIdx.register(df.sparkSession)
    val aggs = dims.flatMap(d =>
      Seq(min(d.cast(LongType)), max(d.cast(LongType))))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val ranked = dims.zipWithIndex.map { case (d, i) =>
      rank(d.cast(LongType), bounds.getLong(2 * i), bounds.getLong(2 * i + 1),
           BitsPerDim)
    }
    val h = graft.functions.HilbertIdx.hilbert_idx(BitsPerDim, ranked: _*)
    val conf = df.sparkSession.conf
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = conf.get(key)
    conf.set(key, "TIMESTAMP_MICROS")
    try df.withColumn("__h", h)
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(out)
    finally conf.set(key, prev)
  }

  private def hash(sfDir: String, files: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sfDir|$files|$Tag|$BitsPerDim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)

  /** Ensure the 3-dim Hilbert-clustered lineitem copy for `sfDir` exists,
    * clustered on (l_partkey, day(l_shipdate), l_suppkey) — the three
    * independent slice dimensions of q77. File-count sizing and
    * content-address + marker caching identical to
    * [[ZOrderLayout.ensureLineitem]]. */
  def ensureLineitem3(s: SparkSession, sfDir: String): String = synchronized {
    val targetBytes =
      s.conf.get("graft.zorder.targetBytes", (128L << 20).toString).toLong
    val files = math.max(16, math.ceil(
      graft.Tables.tableBytes(sfDir, "lineitem").toDouble / targetBytes).toInt)
    val loc = s"/root/repo/target/hilbert/${hash(sfDir, files)}/lineitem"
    val marker = Paths.get(s"$loc/_h_ok")
    if (!Files.exists(marker)) {
      writeHilbert(graft.Tables.lineitem(s, sfDir),
        Seq(col("l_partkey"), ZOrderLayout.dayOf(col("l_shipdate")),
            col("l_suppkey")),
        loc, files)
      StatsManifest.write(s, loc, StatsCols)
      Files.writeString(marker, "ok")
    } else if (!Files.exists(Paths.get(s"$loc/${StatsManifest.FileName}")))
      // backfill for layouts persisted before the manifest existed
      StatsManifest.write(s, loc, StatsCols)
    loc
  }

  /** Manifest-tracked pruning columns: the three clustered dimensions. */
  val StatsCols: Seq[String] = Seq("l_partkey", "l_shipdate", "l_suppkey")
}
