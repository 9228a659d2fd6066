package graft.core

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import graft.SparkSpec

/** Crash-consistency contract of [[AtomicPublish]] (ADVICE r14): a
  * re-publish over an existing artifact must never pass through a state
  * where NEITHER the old nor the new artifact exists complete. The fix
  * parks the old dest aside before renaming staging in — these tests pin
  * the happy paths and the park-cleanup, and simulate the mid-publish
  * crash window by checking a leftover `_old` never shadows a publish. */
class AtomicPublishSpec extends SparkSpec {

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def writeMarker(dir: String, body: String): Unit = {
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.write(java.nio.file.Paths.get(dir, "marker.txt"),
      body.getBytes("UTF-8")): Unit
  }
  private def readMarker(dir: String): String =
    new String(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "marker.txt")), "UTF-8")

  test("first publish lands the artifact; no staging or parked residue") {
    val root = Files.createTempDirectory("atomic_pub").toString
    val dest = s"$root/art"
    AtomicPublish.publish(spark, dest)(st => writeMarker(st, "v1"))
    assert(readMarker(dest) == "v1")
    assert(!fs.exists(new Path(dest + "_build")))
    assert(!fs.exists(new Path(dest + "_old")))
  }

  test("re-publish replaces the artifact and cleans the parked old copy") {
    val root = Files.createTempDirectory("atomic_pub").toString
    val dest = s"$root/art"
    AtomicPublish.publish(spark, dest)(st => writeMarker(st, "v1"))
    AtomicPublish.publish(spark, dest)(st => writeMarker(st, "v2"))
    assert(readMarker(dest) == "v2")
    assert(!fs.exists(new Path(dest + "_build")))
    assert(!fs.exists(new Path(dest + "_old")))
  }

  test("old artifact survives (parked) while build runs; window has a complete copy") {
    val root = Files.createTempDirectory("atomic_pub").toString
    val dest = s"$root/art"
    AtomicPublish.publish(spark, dest)(st => writeMarker(st, "v1"))
    // during the second publish's build phase the LIVE dest must still be
    // the complete v1 artifact (the park happens after build, just before
    // the rename-in) — a reader mid-build sees old, never nothing
    AtomicPublish.publish(spark, dest) { st =>
      assert(readMarker(dest) == "v1",
        "live artifact must stay complete while the replacement builds")
      writeMarker(st, "v2")
    }
    assert(readMarker(dest) == "v2")
  }

  test("a stale parked dir from a crashed prior publish does not block or shadow") {
    val root = Files.createTempDirectory("atomic_pub").toString
    val dest = s"$root/art"
    AtomicPublish.publish(spark, dest)(st => writeMarker(st, "v1"))
    writeMarker(dest + "_old", "crashed-leftover")
    AtomicPublish.publish(spark, dest)(st => writeMarker(st, "v2"))
    assert(readMarker(dest) == "v2")
    assert(!fs.exists(new Path(dest + "_old")))
  }

  test("failed build leaves the previous artifact untouched") {
    val root = Files.createTempDirectory("atomic_pub").toString
    val dest = s"$root/art"
    AtomicPublish.publish(spark, dest)(st => writeMarker(st, "v1"))
    intercept[RuntimeException] {
      AtomicPublish.publish(spark, dest)(_ => throw new RuntimeException("boom"))
    }
    assert(readMarker(dest) == "v1")
  }
}
