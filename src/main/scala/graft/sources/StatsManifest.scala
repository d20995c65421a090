package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-level min/max stats manifest for the persisted layouts — the
  * Delta/Iceberg move applied at plain-parquet level.
  *
  * WHY: layout pruning (q74's z-order slice, q77's Hilbert box) is footer
  * work — each file's parquet footer carries the min/max that decides
  * whether the file intersects the query box. Reading footers per file is
  * fine at 28 files and a DRIVER-SIDE bottleneck at deployment file
  * counts: thousands of files × one footer round-trip each, paid at PLAN
  * time on every query (Spark's own split planning does the same listing
  * + footer pass). A min/max manifest written ONCE at layout-build time
  * makes plan-time pruning O(1) reads: one small JSON-lines file, scanned
  * on the driver, instead of O(files) footer fetches.
  *
  * WHAT: `_stats_manifest.json` in the layout dir — one JSON line per
  * data file: name, bytes, rows, and per tracked column the file-hull
  * [min,max] as signed longs (INT32/INT64 physical columns: ids, epoch
  * days, epoch micros — exactly the dimension types the layouts cluster
  * on). Underscore prefix → invisible to Spark's file listing, like
  * `_SUCCESS`.
  *
  * CONTRACT: the manifest is written by the layout builder AFTER the data
  * files are final (build / append / compact all rewrite it), and lists
  * EVERY data file — pruning reads only manifest-listed files, so a
  * missing entry would silently drop rows. [[prunedScan]] therefore
  * cross-checks the manifest's file census against one cheap name-only
  * directory listing (an O(1)-RPC `list` call, NOT per-file footer reads
  * — the thing this module exists to avoid) and falls back to the full
  * scan, loudly, on any mismatch: stale pruning degrades to correct-but-
  * unpruned, never to wrong.
  *
  * The stats themselves are read DISTRIBUTED at build time (executors
  * open footers via parquet-hadoop), so manifest construction scales with
  * the cluster, not the driver.
  */
object StatsManifest {

  val FileName = "_stats_manifest.json"

  /** One data file's manifest row. `name` is the path RELATIVE to the
    * layout root (plain file name for flat layouts; `order_year=2015/
    * part-….parquet` for partitioned ones — round 14, VERDICT r13 #3).
    * Stats map: column → (min, max), file hull over its row groups;
    * absent when the footer carries no usable stats for that column
    * (pruning then keeps the file — conservative). */
  final case class Entry(name: String, bytes: Long, rows: Long,
                         stats: Map[String, (Long, Long)])

  /** Footer min/max of the requested columns for one parquet file, as
    * longs (INT32 widened; INT64 as-is — covers ids, DATE epoch-days,
    * TIMESTAMP_MICROS epoch-micros). Runs on EXECUTORS at build time. */
  private def footerEntry(file: java.io.File, cols: Seq[String]): Entry = {
    val in = HadoopInputFile.fromPath(new Path(file.getAbsolutePath),
                                      new Configuration())
    val r = ParquetFileReader.open(in)
    try {
      val blocks = r.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      val stats = cols.flatMap { c =>
        val perBlock = blocks.flatMap { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString == c)
            .flatMap { cc =>
              val st = cc.getStatistics
              if (st == null || st.isEmpty || !st.hasNonNullValue) None
              else (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) =>
                  Some((mn.longValue, mx.longValue))
                case (mn: java.lang.Integer, mx: java.lang.Integer) =>
                  Some((mn.longValue, mx.longValue))
                case _ => None // non-integral physical type: no pruning
              }
            }
        }
        // file hull = union of row-group ranges; ALL row groups must carry
        // stats or the column is dropped for this file (a stats-less row
        // group could hold rows outside the partial hull)
        if (perBlock.nonEmpty && perBlock.size == blocks.size)
          Some(c -> ((perBlock.map(_._1).min, perBlock.map(_._2).max)))
        else None
      }.toMap
      Entry(file.getName, file.length(), rows, stats)
    } finally r.close()
  }

  /** Data files under `dir`, RECURSIVE, as (relative path, file) — one
    * walk serves flat layouts (relative path == file name, behavior
    * unchanged) and partition-directory layouts (`year=…/file.parquet`).
    * Dot/underscore-prefixed entries are skipped at every level, so
    * `.compact_tmp` staging dirs and `_`-metadata never census. */
  private def dataFiles(dir: String): Seq[(String, java.io.File)] = {
    def walk(f: java.io.File, rel: String): Seq[(String, java.io.File)] =
      if (f.getName.startsWith(".") || f.getName.startsWith("_")) Nil
      else if (f.isDirectory)
        Option(f.listFiles).toSeq.flatten.flatMap(c =>
          walk(c, if (rel.isEmpty) c.getName else s"$rel/${c.getName}"))
      else if (f.isFile && f.getName.endsWith(".parquet")) Seq((rel, f))
      else Nil
    Option(new java.io.File(dir).listFiles).toSeq.flatten
      .flatMap(c => walk(c, c.getName)).sortBy(_._1)
  }

  /** Build (or rebuild) the manifest for the layout at `dir`, tracking
    * `cols`. Footer reads run distributed; the tiny result set collects
    * to the driver (one row per FILE — bounded by layout file count, the
    * same cardinality the manifest itself holds). Written atomically
    * (temp + move) so readers never see a torn manifest. */
  def write(s: SparkSession, dir: String, cols: Seq[String]): Unit = {
    val files = dataFiles(dir)
    if (files.isEmpty) return
    val paths = files.map { case (rel, f) => (rel, f.getAbsolutePath) }
    import s.implicits._
    val colsB = cols // stable local for the closure
    val entries = s.createDataset(paths)
      .repartition(math.min(paths.size, 32))
      .map { case (rel, p) =>
        render(footerEntry(new java.io.File(p), colsB).copy(name = rel)) }
      .collect()
      .sorted
    val tmp = Paths.get(s"$dir/.${FileName}.tmp")
    Files.writeString(tmp, entries.mkString("", "\n", "\n"))
    Files.move(tmp, Paths.get(s"$dir/$FileName"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def render(e: Entry): String = {
    val st = e.stats.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
      s""""$c":[$mn,$mx]""" }.mkString("{", ",", "}")
    s"""{"name":"${e.name}","bytes":${e.bytes},"rows":${e.rows},"stats":$st}"""
  }

  // hand-rolled line parse — the writer above is the only producer, the
  // grammar is one flat object per line with known keys
  private val nameRe = "\"name\":\"([^\"]+)\"".r
  private val bytesRe = "\"bytes\":(\\d+)".r
  private val rowsRe = "\"rows\":(\\d+)".r
  private val statRe = "\"([A-Za-z0-9_.]+)\":\\[(-?\\d+),(-?\\d+)\\]".r

  def read(dir: String): Option[Seq[Entry]] = {
    val p = Paths.get(s"$dir/$FileName")
    if (!Files.exists(p)) None
    else Some(Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { l =>
      val stats = l.indexOf("\"stats\":") match {
        case -1 => Map.empty[String, (Long, Long)]
        case i => statRe.findAllMatchIn(l.substring(i)).map(m =>
          m.group(1) -> ((m.group(2).toLong, m.group(3).toLong))).toMap
      }
      Entry(nameRe.findFirstMatchIn(l).get.group(1),
            bytesRe.findFirstMatchIn(l).get.group(1).toLong,
            rowsRe.findFirstMatchIn(l).get.group(1).toLong, stats)
    })
  }

  /** Closed-interval range predicate on a tracked column: keep files
    * whose [min,max] hull intersects [lo,hi]. `None` bound = unbounded.
    * Values in the column's physical long domain (DATE: epoch days;
    * TIMESTAMP_MICROS: epoch micros). */
  final case class Range(col: String, lo: Option[Long], hi: Option[Long])

  /** Expected must-read bytes for a UNIFORMLY RANDOM probe point over the
    * tracked dims — the recluster policy's tightness metric (round 15,
    * VERDICT r14 #2): Σ over files of bytes·Π_dims(hull width / domain
    * width), i.e. each file weighted by the probability a random point
    * lands inside its hull. Pure manifest arithmetic, no I/O beyond the
    * one manifest read the caller already has.
    *
    * Why this scalar: a WELL-clustered layout's files tile the key space,
    * so the metric ≈ the bytes of the few files covering any one point
    * (~one file) — and it stays there as the corpus grows, because more
    * data means more, proportionally narrower hulls. A delta file
    * clustered only among itself spans ~the full domain in every dim and
    * contributes ~its WHOLE bytes — so the metric reads floor + Σ delta
    * bytes, exactly the pruning-tightness decay the policy must bound.
    * Files lacking stats for a dim count their full bytes (conservative,
    * same as pruning keeps them). Degenerate domains (single value)
    * count as width 1. */
  def pointProbeBytes(entries: Seq[Entry], cols: Seq[String]): Double =
    pointProbeBytes(entries, cols, domainsOf(entries, cols))

  /** The tracked columns' data domains as the union of file hulls — the
    * denominator [[pointProbeBytes]] normalizes against. Recorded into
    * `_layout_meta` at (re)cluster time (round 16, ADVICE r15): computed
    * LIVE, a delta file with outlier key values widens the domain and
    * shrinks every existing file's hull ratio, so the metric is not
    * monotone in appended deltas and such deltas can defer the recluster
    * fold past the intended bloat bound. Anchoring floor AND live metric
    * to the domain recorded at the last (re)cluster makes every appended
    * file contribute ≥ 0 (hull ratios clamp at 1, so an outlier delta
    * counts its full bytes — conservative, same direction as pruning). */
  def domainsOf(entries: Seq[Entry], cols: Seq[String]): Map[String, (Long, Long)] =
    cols.map { c =>
      val hulls = entries.flatMap(_.stats.get(c))
      c -> (if (hulls.isEmpty) (0L, 0L)
            else (hulls.map(_._1).min, hulls.map(_._2).max))
    }.toMap

  /** [[pointProbeBytes]] against FIXED domains (see [[domainsOf]]): the
    * recluster policy evaluates floor and live metric against the same
    * denominator recorded at the last (re)cluster. */
  def pointProbeBytes(entries: Seq[Entry], cols: Seq[String],
                      domains: Map[String, (Long, Long)]): Double = {
    entries.map { e =>
      e.bytes * cols.map { c =>
        val (dLo, dHi) = domains.getOrElse(c, (0L, 0L))
        e.stats.get(c) match {
          case Some((mn, mx)) if dHi > dLo =>
            math.min(1.0, (mx - mn + 1).toDouble / (dHi - dLo + 1).toDouble)
          case _ => 1.0
        }
      }.product
    }.sum
  }

  /** The manifest-pruned must-read file names for a conjunction of range
    * predicates — the same file-hull intersection a footer-pruning reader
    * computes, answered from ONE manifest read. Files without stats for a
    * predicate column are conservatively kept. */
  def mustRead(entries: Seq[Entry], preds: Seq[Range]): Seq[String] =
    entries.filter { e =>
      preds.forall { p =>
        e.stats.get(p.col) match {
          case Some((mn, mx)) =>
            p.hi.forall(mn <= _) && p.lo.forall(mx >= _)
          case None => true // no stats → cannot exclude
        }
      }
    }.map(_.name)

  /** Manifest-pruned scan of the layout at `dir`: reads ONLY the files
    * whose stats hull intersects every predicate. The caller must still
    * apply the full row-level filter (manifest pruning is file-granular;
    * row-group skipping inside selected files still happens from their
    * own footers, as in any parquet scan).
    *
    * Census guard: if the manifest's file set does not exactly match the
    * live directory's data files (a writer crashed between data and
    * manifest, or foreign files appeared), pruning is UNSAFE — fall back
    * to the full-directory scan with a loud stderr note. Costs one
    * name-only listing, which the scan's own file index pays anyway.
    * An all-files prune result also short-circuits to the directory scan
    * (one relation instead of N file paths in the plan). */
  def prunedScan(s: SparkSession, dir: String, preds: Seq[Range]): DataFrame =
    read(dir) match {
      case Some(entries)
          if entries.map(_.name).sorted == dataFiles(dir).map(_._1) =>
        val keep = mustRead(entries, preds)
        if (keep.size == entries.size) s.read.parquet(dir)
        // empty must-read: schema still needed — scan the dir with an
        // always-false partition of files is not expressible; read the
        // full dir and let row-level filters return 0 rows (rare: a query
        // box outside the data domain)
        else if (keep.isEmpty) s.read.parquet(dir)
        // partitioned layout (names carry partition dirs): basePath keeps
        // the partition columns in the schema of a file-list read
        else if (keep.exists(_.contains("/")))
          s.read.option("basePath", dir).parquet(keep.map(n => s"$dir/$n"): _*)
        else s.read.parquet(keep.map(n => s"$dir/$n"): _*)
      case Some(_) =>
        System.err.println(s"[stats-manifest] census mismatch under $dir — " +
          "pruning disabled for this scan (correct-but-unpruned fallback)")
        s.read.parquet(dir)
      case None => s.read.parquet(dir)
    }
}
