package graft.core

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import graft.SparkSpec

/** Multi-process contract of [[VersionedPublish]] (VERDICT r14 missing
  * #1): the shared serve indexes are published MVCC-style with a
  * marker-file commit so concurrent readers/writers on one scratch root
  * can never tear — or pollute — a read. "Processes" are modeled by
  * threads: the mechanism under test is filesystem-level (immutable
  * artifact dirs + atomic marker rename + highest-marker resolution),
  * which is process-agnostic. The two-writer test also pins the reason
  * the commit is a FILE rename: a directory-rename commit nests the
  * loser's build inside the winner's artifact on Hadoop filesystems
  * (rename-into semantics) — the resolved artifact must stay clean. */
class VersionedPublishSpec extends SparkSpec {

  private def writeArtifact(dir: String, body: String): Unit = {
    Files.createDirectories(java.nio.file.Paths.get(dir))
    // two files: a torn read (mixed versions, or a missing file) is
    // detectable because both must agree
    Files.write(java.nio.file.Paths.get(dir, "a.txt"), body.getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(dir, "b.txt"), body.getBytes("UTF-8")): Unit
  }
  private def readArtifact(dir: String): (String, String) = (
    new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "a.txt")), "UTF-8"),
    new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "b.txt")), "UTF-8"))
  private def entries(dir: String): Set[String] =
    Option(new java.io.File(dir).list()).map(_.toSet).getOrElse(Set.empty)

  test("publish commits v0 and resolution finds it (Spark and local paths)") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    val d0 = VersionedPublish.publish(spark, root)(writeArtifact(_, "v0"))
    assert(readArtifact(d0) == (("v0", "v0")))
    assert(VersionedPublish.currentDir(spark, root).contains(d0))
    assert(VersionedPublish.currentDirLocal(root).contains(d0))
    assert(VersionedPublish.versions(spark, root) == Seq(0L))
  }

  test("republish commits v1; old version stays readable (retain=2)") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    val d0 = VersionedPublish.publish(spark, root)(writeArtifact(_, "v0"))
    val d1 = VersionedPublish.publish(spark, root)(writeArtifact(_, "v1"))
    assert(VersionedPublish.currentDir(spark, root).contains(d1))
    // a reader holding v0 across the republish still reads it complete
    assert(readArtifact(d0) == (("v0", "v0")))
    // a third publish prunes v0's marker AND dir (retain = 2)
    VersionedPublish.publish(spark, root)(writeArtifact(_, "v2")): Unit
    assert(!new java.io.File(d0).exists())
    assert(VersionedPublish.versions(spark, root) == Seq(1L, 2L))
    assert(readArtifact(d1) == (("v1", "v1")))
  }

  test("every publish builds fresh — a persistent root cannot serve a stale corpus") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    VersionedPublish.publish(spark, root)(writeArtifact(_, "old-corpus")): Unit
    // a "new process" (fresh memo) publishes after the corpus changed:
    // it must NOT serve the existing version
    val d1 = VersionedPublish.publish(spark, root)(writeArtifact(_, "new-corpus"))
    assert(readArtifact(d1) == (("new-corpus", "new-corpus")))
    assert(VersionedPublish.currentDir(spark, root).contains(d1))
  }

  test("a crashed build's unmarked artifact dir is invisible to resolution") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    VersionedPublish.publish(spark, root)(writeArtifact(_, "v0")): Unit
    writeArtifact(s"$root/b_deadprocess42", "torn")
    val live = VersionedPublish.currentDir(spark, root).get
    assert(readArtifact(live) == (("v0", "v0")),
      "orphan build dirs must never resolve as live")
  }

  test("open during publish sees a complete old or complete new artifact") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    VersionedPublish.publish(spark, root)(writeArtifact(_, "v0")): Unit
    val started = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val writer = pool.submit(new Runnable {
      def run(): Unit = VersionedPublish.publish(spark, root) { st =>
        started.countDown()
        writeArtifact(st, "v1")
        Thread.sleep(150) // hold the build open while readers poll
      }: Unit
    })
    started.await(10, TimeUnit.SECONDS): Unit
    val seen = scala.collection.mutable.Set[String]()
    val deadline = System.nanoTime() + 3_000_000_000L
    while (!writer.isDone && System.nanoTime() < deadline) {
      val dir = VersionedPublish.currentDir(spark, root).get
      val (a, b) = readArtifact(dir)
      assert(a == b && (a == "v0" || a == "v1"), s"torn read: ($a, $b) at $dir")
      seen += a
    }
    writer.get(30, TimeUnit.SECONDS): Unit
    pool.shutdown()
    assert(seen.contains("v0"), "poll loop should observe the old version")
    val (a, b) = readArtifact(VersionedPublish.currentDir(spark, root).get)
    assert((a, b) == (("v1", "v1")))
  }

  test("two writers racing on an empty root: resolution converges on ONE unpolluted artifact") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val fills = (0 until 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = {
          gate.await()
          VersionedPublish.publish(spark, root)(writeArtifact(_, s"w$i"))
        }
      })
    }
    gate.countDown()
    val dirs = fills.map(_.get(30, TimeUnit.SECONDS))
    pool.shutdown()
    // each writer got back a COMPLETE artifact (its own, or the winner's)
    dirs.foreach { d =>
      val (a, b) = readArtifact(d)
      assert(a == b && a.startsWith("w"), s"torn artifact at $d: ($a, $b)")
    }
    // resolution converges on one complete artifact, and that artifact is
    // UNPOLLUTED: exactly the two payload files, no nested build dir from
    // the losing writer (the failure mode of a directory-rename commit)
    val live = VersionedPublish.currentDirLocal(root).get
    val (a, b) = readArtifact(live)
    assert(a == b)
    assert(entries(live) == Set("a.txt", "b.txt"),
      s"winner's artifact polluted: ${entries(live)}")
  }

  test("retain guard") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    intercept[IllegalArgumentException](
      VersionedPublish.publish(spark, root, retain = 0)(writeArtifact(_, "x")))
  }
}
