package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Once-per-corpus materialized intermediate tables ("artifacts").
  *
  * A production pipeline does not rebuild its expensive derived tables —
  * the near-dup pair table, the pre-split event log — inside every query
  * that consumes them; a build stage writes each ONCE and downstream
  * stages read the stored artifact. This helper reproduces that layout
  * for the in-process engine: `materialize(name)(build)` runs `build`
  * into a scratch directory exactly once per (artifact name, corpus
  * fingerprint) and hands every caller the finished path.
  *
  * Guarantees:
  *   - single build per JVM (lock + memo) and atomicity across JVMs
  *     (build into a pid-unique tmp dir, `ATOMIC_MOVE` rename; a lost
  *     race discards its tmp and uses the winner's artifact);
  *   - staleness-proof: [[corpusKey]] folds the source table's file
  *     sizes + mtimes into the key, so a regenerated corpus at the same
  *     path can never alias an old artifact.
  */
object Artifacts {
  private val lock = new Object
  @volatile private var done: Set[String] = Set.empty

  private def root: Path =
    Paths.get(sys.props("java.io.tmpdir"), "graft_artifacts")

  /** Fingerprint of `table` (e.g. "documents.parquet") under sf dir `d`. */
  def corpusKey(d: String, table: String): String = {
    val src = Paths.get(d, table)
    val parts: Seq[Path] =
      if (Files.isDirectory(src)) {
        val s = Files.list(src)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toSeq.sortBy(_.toString)
        } finally s.close()
      } else Seq(src)
    val sig = parts.map(p =>
      s"$p:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}").mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|$sig".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 16)
  }

  /** True iff the artifact root exists and holds at least one entry —
    * i.e. a following run would be (partially) warm. */
  def rootNonEmpty: Boolean =
    Files.exists(root) && {
      val s = Files.list(root)
      try s.iterator().hasNext finally s.close()
    }

  /** Bench/dev tooling: recursively delete the artifact root and reset
    * the in-JVM memo, forcing every artifact to rebuild (used by
    * `graft.Bench --cold` so cold/warm comparability is a harness flag,
    * not a manual cleanup step). */
  def clearAll(): Unit = lock.synchronized {
    done = Set.empty
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val w = Files.walk(root)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally w.close()
    }
  }

  /** Per-run scratch sink path: `<tmpdir>/graft_run_<appId>/<name>`.
    * Sink-roundtrip queries (q02, q240) write-then-read under here; the
    * applicationId segment keeps two concurrent runs from interleaving
    * one run's overwrite with the other's read-back, and ONE shutdown
    * hook per JVM removes the whole per-run root so /tmp stays bounded
    * (the old fixed-per-corpus paths traded the race for boundedness;
    * this gets both).
    */
  def perRunSinkPath(spark: SparkSession, name: String): String = {
    val runRoot = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_run_${spark.sparkContext.applicationId}")
    lock.synchronized {
      if (!hookInstalled) {
        hookInstalled = true
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          if (Files.exists(runRoot)) {
            import scala.jdk.CollectionConverters._
            val w = Files.walk(runRoot)
            try w.iterator().asScala.toSeq.reverse.foreach(p =>
              try Files.delete(p) catch { case _: Exception => () })
            finally w.close()
          }
        }))
      }
    }
    runRoot.resolve(name).toString
  }
  @volatile private var hookInstalled = false

  /** Build-once: returns the path of artifact `name`, running
    * `build(tmpPath)` first if no complete artifact exists. `name` must
    * already include the corpus fingerprint (see [[corpusKey]]) AND a
    * build-logic version tag (`_v1_` by convention): the fingerprint
    * detects corpus changes but cannot see code, so any change to a
    * build's logic MUST bump its version tag or stale on-disk artifacts
    * from the previous logic would be silently reused.
    */
  def materialize(name: String)(build: String => Unit): String = {
    val target = root.resolve(name)
    if (done.contains(name)) return target.toString
    lock.synchronized {
      if (!done.contains(name)) {
        if (!Files.exists(target.resolve("_SUCCESS"))) {
          Files.createDirectories(root)
          val tmp = root.resolve(s"${name}_tmp_${ProcessHandle.current().pid()}")
          build(tmp.toString)
          try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
          // FileSystemException, not just its two subclasses: a rename
          // onto an existing non-empty directory surfaces as the generic
          // ENOTEMPTY FileSystemException on Linux
          catch { case _: java.nio.file.FileSystemException =>
            // lost a cross-process race: the winner's artifact stands
            import scala.jdk.CollectionConverters._
            val w = Files.walk(tmp)
            try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
            finally w.close()
          }
        }
        done += name
      }
    }
    target.toString
  }
}
