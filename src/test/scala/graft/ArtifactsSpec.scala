package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Artifacts

/** The once-per-corpus artifact store underneath q43/q46–q49/q55 and the
  * q98 event-log split: build-once memoization, fingerprint staleness,
  * and reentrancy (an artifact build that consumes another artifact).
  */
class ArtifactsSpec extends AnyFunSuite {

  private def uniq(prefix: String) =
    s"${prefix}_${java.util.UUID.randomUUID().toString.take(8)}"

  test("materialize runs the build exactly once per name") {
    var builds = 0
    val name = uniq("spec_once")
    def get() = Artifacts.materialize(name) { tmp =>
      builds += 1
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "data"), "x")
      Files.writeString(Paths.get(tmp, "_SUCCESS"), "")
    }
    val p1 = get()
    val p2 = get()
    assert(builds == 1)
    assert(p1 == p2)
    assert(Files.exists(Paths.get(p1, "_SUCCESS")))
  }

  test("corpusKey changes when the source file's size or mtime changes") {
    val dir = Files.createTempDirectory("graft_spec_corpus")
    val f = dir.resolve("t.parquet")
    Files.writeString(f, "abc")
    val k1 = Artifacts.corpusKey(dir.toString, "t.parquet")
    assert(k1 == Artifacts.corpusKey(dir.toString, "t.parquet"), "key must be stable")
    Files.writeString(f, "abcd") // size change
    val k2 = Artifacts.corpusKey(dir.toString, "t.parquet")
    assert(k2 != k1, "regenerated corpus must not alias the old artifact")
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(f).toMillis + 5000)) // mtime change
    val k3 = Artifacts.corpusKey(dir.toString, "t.parquet")
    assert(k3 != k2)
  }

  test("nested materialize (artifact built from another artifact) is reentrant") {
    val inner = uniq("spec_inner")
    val outer = uniq("spec_outer")
    var innerBuilds = 0
    def innerPath() = Artifacts.materialize(inner) { tmp =>
      innerBuilds += 1
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "_SUCCESS"), "")
    }
    val outerPath = Artifacts.materialize(outer) { tmp =>
      val ip = innerPath() // the ngramPairs-from-docShingles shape
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(tmp, "from"), ip)
      Files.writeString(Paths.get(tmp, "_SUCCESS"), "")
    }
    assert(innerBuilds == 1)
    assert(Files.readString(Paths.get(outerPath, "from")) == innerPath())
  }

  test("a finished artifact on disk is adopted without rebuilding (cross-JVM reuse)") {
    // simulate another process having completed the same artifact
    val name = uniq("spec_adopt")
    val target = Paths.get(sys.props("java.io.tmpdir"), "graft_artifacts", name)
    Files.createDirectories(target)
    Files.writeString(target.resolve("data"), "prebuilt")
    Files.writeString(target.resolve("_SUCCESS"), "")
    var builds = 0
    val p = Artifacts.materialize(name) { _ => builds += 1 }
    assert(builds == 0, "must adopt the finished artifact, not rebuild")
    assert(Files.readString(Paths.get(p, "data")) == "prebuilt")
  }
}
