package graft.superstore

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.StatsManifest

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

  /** S6 at full fidelity — the reference's `generate_excel.py:50-111`
    * analog: one .xlsx workbook, one sheet per table, bold header row,
    * column widths sized to content and capped. Written with zero
    * dependencies (an xlsx is a zip of XML; strings go as inlineStr,
    * numbers as native cells, dates as ISO strings) and validated by
    * round-tripping through the same stdlib extractor
    * (tools/extract_xlsx.py) that produced the golden fixtures from the
    * reference's export.
    *
    * Driver-side by design, exactly like the reference's script: this is
    * a PRESENTATION export of bounded dimension/aggregate tables (a few
    * ten-thousand rows), not a data path — big facts ship via
    * [[exportAll]]/parquet. HARD BOUND: every table is `.collect()`ed to
    * the driver, so inputs must fit driver memory — do NOT point this at
    * a fact table; there is deliberately no spill path because a
    * one-workbook xlsx cannot be written distributed anyway. Rows are
    * ordered by each table's first
    * (surrogate-id) column for determinism. */
  def exportXlsx(wh: Map[String, DataFrame], path: String,
                 maxColWidth: Int = 50): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val names = wh.keys.toSeq.sorted
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(entry: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(entry))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
      names.indices.map(i =>
        s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
      "</Types>")
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      "</Relationships>")
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
      names.zipWithIndex.map { case (n, i) =>
        s"""<sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString +
      "</sheets></workbook>")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      names.indices.map(i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString +
      s"""<Relationship Id="rId${names.length + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
      "</Relationships>")
    // style 1 = bold (header row), matching generate_excel.py's header font
    put("xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<fonts count="2"><font/><font><b/></font></fonts>""" +
      """<fills count="1"><fill><patternFill patternType="none"/></fill></fills>""" +
      """<borders count="1"><border/></borders>""" +
      """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
      """<cellXfs count="2"><xf xfId="0"/><xf xfId="0" fontId="1" applyFont="1"/></cellXfs>""" +
      "</styleSheet>")
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    names.zipWithIndex.foreach { case (table, si) =>
      val df = wh(table)
      val cols = df.columns
      val rows = df.orderBy(cols.head).collect()
      def cellText(v: Any): String = v match {
        case null => ""
        case d: java.sql.Date => d.toString
        case x => x.toString
      }
      val widths = cols.indices.map { i =>
        val m = (cols(i).length +: rows.map(r => cellText(r.get(i)).length))
          .max
        math.min(m + 2, maxColWidth)
      }
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><cols>"""
      widths.zipWithIndex.foreach { case (w, i) =>
        sb ++= s"""<col min="${i + 1}" max="${i + 1}" width="$w" customWidth="1"/>""" }
      sb ++= "</cols><sheetData>"
      sb ++= "<row r=\"1\">"
      cols.zipWithIndex.foreach { case (c, i) =>
        sb ++= s"""<c r="${colRef(i)}1" t="inlineStr" s="1"><is><t>${esc(c)}</t></is></c>""" }
      sb ++= "</row>"
      rows.zipWithIndex.foreach { case (r, ri) =>
        sb ++= s"""<row r="${ri + 2}">"""
        cols.indices.foreach { i =>
          val ref = s"${colRef(i)}${ri + 2}"
          r.get(i) match {
            case null => ()
            case n @ (_: Int | _: Long | _: Double | _: Float | _: Short | _: Byte) =>
              sb ++= s"""<c r="$ref"><v>$n</v></c>"""
            case n: java.math.BigDecimal =>
              sb ++= s"""<c r="$ref"><v>${n.toPlainString}</v></c>"""
            case v =>
              sb ++= s"""<c r="$ref" t="inlineStr"><is><t>${esc(cellText(v))}</t></is></c>"""
          }
        }
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      put(s"xl/worksheets/sheet${si + 1}.xml", sb.toString)
    }
    zos.close()
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
    * year-month) keeps partition counts bounded and file sizes healthy.
    *
    * Rows are sorted by calendar_id WITHIN each year before writing
    * (round 8): parquet footers then carry tight, near-disjoint min/max
    * stats per row group on the time key, so a calendar-ranged predicate
    * is answered by the reader from the footer — whole row groups are
    * skipped below the directory-pruning grain (ExporterSpec audits the
    * footer stats directly). Clustering the sort key is what makes the
    * stats selective; unsorted writes carry full-range stats that can
    * never prune. */
  def persistItemPartitioned(item: DataFrame, calendar: DataFrame,
                             outDir: String): Unit = {
    // a full (re)build supersedes any in-flight compaction state
    graft.Fs.deleteTree(java.nio.file.Paths.get(s"$outDir/$CompactTmp"))
    graft.Fs.deleteTree(java.nio.file.Paths.get(s"$outDir/$CompactOld"))
    item
      .join(broadcast(calendar.select(col("calendar_id"), col("year_number"))),
            "calendar_id")
      .withColumnRenamed("year_number", "order_year")
      .sortWithinPartitions("order_year", "calendar_id")
      .write.mode("overwrite")
      .partitionBy("order_year")
      .parquet(s"$outDir/Item_by_year")
    // stats manifest over the partition tree (round 14, VERDICT r13 #3):
    // the last persisted structure still pruning via per-file footer
    // reads joins the manifest layer — calendar-ranged readers answer
    // must-read from ONE manifest read (readItemPruned) instead of
    // O(files) footer fetches at plan time; partition-dir pruning on
    // order_year still comes first and free.
    StatsManifest.write(item.sparkSession, s"$outDir/Item_by_year",
      Seq("calendar_id"))
  }

  /** Manifest-routed calendar-range reader over the partitioned Item
    * layout: file-level pruning below the year-directory grain from one
    * `_stats_manifest.json` read, census-guarded (falls back to the full
    * scan, loudly, on any mismatch — correct-but-unpruned, never wrong).
    * The caller still applies the row-level filter; this routes the SCAN,
    * exactly like q74/q77 over the clustered layouts. */
  def readItemPruned(s: SparkSession, outDir: String,
                     loCal: Option[Long], hiCal: Option[Long]): DataFrame =
    StatsManifest.prunedScan(s, s"$outDir/Item_by_year",
      Seq(StatsManifest.Range("calendar_id", loCal, hiCal)))

  // ---- incremental maintenance for the partitioned Item tree ----------
  // (round 15, VERDICT r14 #3: the last persisted structure without an
  // append story — persistItemPartitioned was overwrite-only and
  // compactPartitioned had a verb but no policy.)

  private val CompactTmp = ".item_compact_tmp"
  private val CompactOld = ".item_old"

  /** O(delta) maintenance for the partitioned Item tree: write the new
    * rows into their year partitions (same join/sort shape as the full
    * build, append mode — a new day lands as one file in its year dir),
    * refresh the stats manifest, and apply the row-conservation guard
    * (BucketedLayout.appendDelta's discipline): `item` is the CALLER'S
    * source of truth for the whole table, `delta` exactly the rows added
    * since the layout last reflected it; if the appended layout's
    * manifest row sum diverges from the source count, rebuild LOUDLY
    * instead of serving a silently-diverged layout. A crash between the
    * data append and the manifest refresh leaves a census mismatch →
    * readItemPruned falls back to the full scan, loudly — every crash
    * point degrades to correct.
    *
    * The guard's source side costs metadata when the caller supplies
    * `expectedSourceRows` (an ingest ledger knows how many rows it has
    * shipped — the BucketedLayout memoized-count shape); absent, it falls
    * back to `item.count()`, which re-runs the caller's whole source
    * pipeline per append (ADVICE r15) — fine for a table-backed frame,
    * O(source) for a full ETL expression. */
  /** The live tree's partition grain, read from the directory names: a
    * year-grain tree holds `order_year=Y/part-*.parquet`; an EVOLVED tree
    * (see [[maintainItemPartitioned]]) holds
    * `order_year=Y/order_month=M/part-*.parquet`. Self-describing — no
    * meta file to desync from the layout. */
  private[superstore] def itemGrain(outDir: String): Seq[String] = {
    val loc = new java.io.File(s"$outDir/Item_by_year")
    val evolved = Option(loc.listFiles).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith("order_year="))
      .exists(y => Option(y.listFiles).toSeq.flatten
        .exists(m => m.isDirectory && m.getName.startsWith("order_month=")))
    if (evolved) Seq("order_year", "order_month") else Seq("order_year")
  }

  /** Delta (or source) rows decorated with the tree's partition columns
    * at the given grain — the calendar lookup both the build and the
    * append share. */
  private def withGrainCols(rows: DataFrame, calendar: DataFrame,
                            grain: Seq[String]): DataFrame = {
    val calCols = Seq(col("calendar_id"), col("year_number")) ++
      (if (grain.contains("order_month")) Seq(col("month_number")) else Nil)
    val joined = rows
      .join(broadcast(calendar.select(calCols: _*)), "calendar_id")
      .withColumnRenamed("year_number", "order_year")
    if (grain.contains("order_month"))
      joined.withColumnRenamed("month_number", "order_month")
    else joined
  }

  def appendItemPartitioned(item: DataFrame, delta: DataFrame,
                            calendar: DataFrame, outDir: String,
                            expectedSourceRows: Option[Long] = None): Unit = {
    val loc = s"$outDir/Item_by_year"
    // heal BEFORE the existence check: a crash mid-swap leaves the live
    // tree temporarily under .item_old/.item_compact_tmp — that state
    // must heal into a serving tree, not read as "no layout"
    healPendingItemCompact(outDir)
    require(new java.io.File(loc).isDirectory,
      s"appendItemPartitioned: no persisted layout at $loc — persist first " +
        "(appending into a missing layout would silently build from the " +
        "delta alone)")
    // append at the LIVE tree's grain (year, or year-month post-evolution)
    val grain = itemGrain(outDir)
    withGrainCols(delta, calendar, grain)
      .sortWithinPartitions((grain :+ "calendar_id").map(col): _*)
      .write.mode("append")
      .partitionBy(grain: _*)
      .parquet(loc)
    StatsManifest.write(item.sparkSession, loc, Seq("calendar_id"))
    val layoutRows = StatsManifest.read(loc).map(_.map(_.rows).sum).getOrElse(-1L)
    val sourceRows = expectedSourceRows.getOrElse(item.count())
    if (layoutRows != sourceRows) {
      System.err.println(
        s"[item-layout] append divergence: layout holds $layoutRows rows, " +
        s"source holds $sourceRows — the delta was not exactly the rows " +
        "added since the last persist. Rebuilding from source.")
      persistItemPartitioned(item, calendar, outDir)
    }
  }

  /** Compaction POLICY for the partitioned Item tree — the same shape as
    * BucketedLayout.maintain: fold when any partition's file count
    * exceeds `graft.partitioned.maxFilesPerPartition` (default 4 — ~4
    * ingest days between folds at one delta file per touched partition
    * per day). Census is a name-only walk; the fold itself is
    * [[compactPartitioned]] into a dot-prefixed temp (invisible to the
    * census and to readers) followed by a crash-FORWARD directory swap:
    * the temp's manifest is its completion marker, and
    * [[healPendingItemCompact]] — run at every maintenance entry —
    * finishes a completed swap or discards an incomplete build. Readers
    * are value-correct in EVERY crash state: the live dir always holds a
    * complete tree (pre- or post-fold — compaction is value-neutral).
    * Returns Some((filesBefore, filesAfter)) when a fold ran. */
  def maintainItemPartitioned(s: SparkSession, outDir: String,
                              calendar: Option[DataFrame] = None): Option[(Int, Int)] = {
    healPendingItemCompact(outDir)
    val loc = s"$outDir/Item_by_year"
    val bound = s.conf.getOption("graft.partitioned.maxFilesPerPartition")
      .map(_.toInt).getOrElse(4)
    def walk(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles).toSeq.flatten.flatMap { f =>
        if (f.getName.startsWith(".") || f.getName.startsWith("_")) Nil
        else if (f.isDirectory) walk(f)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      }
    val files = walk(new java.io.File(loc))
    // Partition identity = path RELATIVE to the tree root, not the leaf
    // dir's NAME (ADVICE r16): after year→month evolution the leaves are
    // order_month=M, which COLLIDE across years — a name-keyed census
    // sums files over every year sharing a month, so with more years
    // than the file bound the max exceeds it at one file per partition
    // and compaction refires a full-tree rewrite on EVERY tick. The
    // relative path (order_year=Y/order_month=M) keys each leaf once at
    // any grain depth.
    val locPath = java.nio.file.Paths.get(loc)
    def leafKey(f: java.io.File): String =
      locPath.relativize(f.getParentFile.toPath).toString
    val grain = itemGrain(outDir)
    // ---- partition EVOLUTION (round 16, VERDICT r15 #5): year →
    // year-month when any year partition outgrows the bytes bound.
    // The whole tree evolves in one crash-forward rewrite — Spark's
    // partition discovery requires a UNIFORM leaf depth, so a mixed-grain
    // tree is not servable from plain parquet (it would need a custom
    // FileIndex; table formats exist for exactly that). Uniform evolution
    // keeps every reader transparent: readItemPruned's manifest carries
    // relative paths at any depth, and the scan gains an order_month
    // partition column. Month is the terminal grain — a month partition
    // past the bound compacts (files policy) but does not split further.
    // Opt-in: the bound defaults to "never" and evolution needs the
    // calendar (the month lookup); the divergence rebuild resets to year
    // grain and the policy re-evolves on the next tick.
    val bytesBound = s.conf.getOption("graft.partitioned.maxPartitionBytes")
      .map(_.toLong).getOrElse(Long.MaxValue)
    val perPartitionBytes = files
      .groupBy(leafKey).view.mapValues(_.map(_.length).sum)
    if (grain == Seq("order_year") && calendar.isDefined &&
        perPartitionBytes.nonEmpty && perPartitionBytes.values.max > bytesBound) {
      val tmp = s"$outDir/$CompactTmp"
      graft.Fs.deleteTree(java.nio.file.Paths.get(tmp))
      val monthGrain = Seq("order_year", "order_month")
      val src = withGrainCols(
        s.read.parquet(loc).drop("order_year"), calendar.get, monthGrain)
      val counts = compactFrame(s, src, files, tmp, monthGrain,
        Seq("calendar_id"))
      swapCompacted(outDir)
      return Some(counts)
    }
    val perPartition = files
      .groupBy(leafKey).view.mapValues(_.size)
    if (perPartition.nonEmpty && perPartition.values.max > bound) {
      val tmp = s"$outDir/$CompactTmp"
      graft.Fs.deleteTree(java.nio.file.Paths.get(tmp))
      val counts = compactPartitioned(s, loc, tmp, grain,
        Seq("calendar_id"))
      swapCompacted(outDir) // temp is complete (manifest written) → swap
      Some(counts)
    } else None
  }

  /** The crash-forward swap: live → .old, temp → live, drop .old. Each
    * move is an atomic same-directory rename; [[healPendingItemCompact]]
    * can finish from any interruption point. */
  private def swapCompacted(outDir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val live = Paths.get(s"$outDir/Item_by_year")
    val tmp = Paths.get(s"$outDir/$CompactTmp")
    val old = Paths.get(s"$outDir/$CompactOld")
    Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
    graft.Fs.deleteTree(old)
  }

  /** Heal any interrupted compaction at maintenance entry (the
    * BucketedLayout.finishPendingCompact discipline): a COMPLETE temp
    * (manifest present) rolls FORWARD — the work is done, finish the
    * swap; an incomplete temp is discarded; a leftover .old after the
    * swap is dropped; a mid-swap state (live missing) promotes whichever
    * complete tree exists. */
  private def healPendingItemCompact(outDir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val live = Paths.get(s"$outDir/Item_by_year")
    val tmp = Paths.get(s"$outDir/$CompactTmp")
    val old = Paths.get(s"$outDir/$CompactOld")
    val tmpComplete = Files.exists(
      Paths.get(s"$outDir/$CompactTmp/${StatsManifest.FileName}"))
    if (Files.exists(tmp)) {
      if (!tmpComplete) {
        System.err.println(s"[item-layout] discarding incomplete compaction temp under $outDir")
        graft.Fs.deleteTree(tmp)
      } else if (!Files.exists(live)) {
        // crashed between the two renames: promote the complete temp
        System.err.println(s"[item-layout] finishing interrupted compaction swap under $outDir")
        Files.move(tmp, live, StandardCopyOption.ATOMIC_MOVE)
        graft.Fs.deleteTree(old)
      } else {
        // crashed after the build, before the swap began: roll forward
        System.err.println(s"[item-layout] completing crashed compaction (temp complete) under $outDir")
        swapCompacted(outDir)
      }
    }
    // NOT an else-branch (ADVICE r15): discarding an incomplete temp can
    // itself expose the state {live missing, .item_old present} — the
    // serving tree is under .item_old and must restore in the SAME pass,
    // or the caller's existence check throws with a complete tree on disk
    if (Files.exists(old)) {
      if (Files.exists(live)) graft.Fs.deleteTree(old) // swap done; drop leftover
      else Files.move(old, live, StandardCopyOption.ATOMIC_MOVE) // restore
    }
  }

  /** Small-file compaction for a partitioned fact directory — the
    * maintenance pass every long-lived table needs: streaming/incremental
    * writers accumulate many under-sized files per partition, and scan
    * task count (plus footer/open overhead) grows with FILE count, not
    * data size. Rewrites `srcDir` into `dstDir` with
    * `ceil(bytes / targetBytes)` range-partitioned output tasks, sorted
    * by (partition, sort cols) so the compacted row groups keep tight
    * min/max stats (see persistItemPartitioned). Range partitioning (not
    * hash) keeps the sort key CONTIGUOUS per file — hash bucketing would
    * scatter it and destroy stats selectivity. Returns (files before,
    * files after). */
  def compactPartitioned(s: SparkSession, srcDir: String, dstDir: String,
                         partCols: Seq[String], sortCols: Seq[String],
                         targetBytes: Long = 128L << 20): (Int, Int) =
    compactFrame(s, s.read.parquet(srcDir),
      itemDataFiles(new java.io.File(srcDir)), dstDir, partCols, sortCols,
      targetBytes)

  private def itemDataFiles(d: java.io.File): Seq[java.io.File] =
    Option(d.listFiles).toSeq.flatten.flatMap { f =>
      if (f.isDirectory) itemDataFiles(f)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    }

  /** The shared rewrite both the compaction fold and the grain evolution
    * use: range-partitioned output tasks sized to the source bytes,
    * sorted by (partition, sort cols) for tight row-group stats, one
    * manifest over the result. `before` = the source's data files (task
    * sizing + the returned before-count). */
  private def compactFrame(s: SparkSession, src: DataFrame,
                           before: Seq[java.io.File], dstDir: String,
                           partCols: Seq[String], sortCols: Seq[String],
                           targetBytes: Long = 128L << 20): (Int, Int) = {
    val totalBytes = before.map(_.length).sum
    val outTasks = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val keys = (partCols ++ sortCols).map(col)
    src
      .repartitionByRange(outTasks, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(dstDir)
    // compaction is a (re)build: the compacted tree gets its own manifest
    // so readItemPruned-style readers stay O(1)-read pruned post-compact
    StatsManifest.write(s, dstDir, sortCols)
    (before.size, itemDataFiles(new java.io.File(dstDir)).size)
  }

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
