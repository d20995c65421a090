package graft

import java.nio.file.{Files, Path}

/** Tiny shared filesystem helpers — one implementation instead of the
  * three verbatim copies a review found drifting apart. */
object Fs {

  /** Recursively delete `p` if it exists (no-op otherwise). */
  def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val l = Files.list(p)
        try l.forEach(deleteTree) finally l.close()
      }
      Files.deleteIfExists(p)
    }

  /** Total bytes under `p` (0 when absent). */
  def dirBytes(p: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.map(walk).sum
      else f.length
    val f = new java.io.File(p)
    if (f.exists) walk(f) else 0L
  }
}
