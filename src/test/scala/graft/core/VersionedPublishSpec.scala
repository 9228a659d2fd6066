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

  test("orphan sweep reclaims aged unreferenced builds, spares referenced and in-grace ones") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    val d0 = VersionedPublish.publish(spark, root)(writeArtifact(_, "v0"))
    val d1 = VersionedPublish.publish(spark, root)(writeArtifact(_, "v1"))
    // a crashed build from 10s ago (aged past the 5s grace and older
    // than the newest marker) and a fresh one (inside the grace — a
    // publisher could be about to commit it)
    writeArtifact(s"$root/b_crashed_old", "junk")
    assert(new java.io.File(s"$root/b_crashed_old")
      .setLastModified(System.currentTimeMillis() - 10_000L))
    writeArtifact(s"$root/b_crashed_new", "junk")
    val tmpOld = new java.io.File(s"$root/m_dead.tmp")
    Files.write(tmpOld.toPath, "x".getBytes("UTF-8")): Unit
    assert(tmpOld.setLastModified(System.currentTimeMillis() - 10_000L))
    val swept = VersionedPublish.sweepOrphans(spark, root, graceMs = 5000L)
    assert(swept.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet ==
      Set("b_crashed_old", "m_dead.tmp"))
    assert(!new java.io.File(s"$root/b_crashed_old").exists())
    assert(new java.io.File(s"$root/b_crashed_new").exists(),
      "an in-grace unreferenced dir may be an in-flight staging — must survive")
    // both referenced artifacts untouched, resolution unchanged
    assert(readArtifact(d0) == (("v0", "v0")))
    assert(readArtifact(d1) == (("v1", "v1")))
    assert(VersionedPublish.currentDir(spark, root).contains(d1))
  }

  test("orphan sweep during an in-flight publish leaves the staging and the winner intact") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    VersionedPublish.publish(spark, root)(writeArtifact(_, "v0")): Unit
    val started = new CountDownLatch(1)
    val proceed = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(1)
    val writer = pool.submit(new java.util.concurrent.Callable[String] {
      def call(): String = VersionedPublish.publish(spark, root) { st =>
        writeArtifact(st, "v1")
        started.countDown()
        proceed.await(10, TimeUnit.SECONDS): Unit
      }
    })
    started.await(10, TimeUnit.SECONDS): Unit
    // sweep races the open publish: the staging is unreferenced but in
    // grace — it must survive
    assert(VersionedPublish.sweepOrphans(spark, root) == Seq.empty)
    proceed.countDown()
    val d1 = writer.get(30, TimeUnit.SECONDS)
    pool.shutdown()
    assert(readArtifact(d1) == (("v1", "v1")))
    assert(VersionedPublish.currentDir(spark, root).contains(d1))
  }

  test("orphan sweep on a never-published root sweeps nothing") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    writeArtifact(s"$root/b_stray", "junk")
    assert(new java.io.File(s"$root/b_stray")
      .setLastModified(System.currentTimeMillis() - 100_000L))
    assert(VersionedPublish.sweepOrphans(spark, root, graceMs = 0L) == Seq.empty,
      "no marker = no commit to age against — sweep nothing")
    assert(new java.io.File(s"$root/b_stray").exists())
  }

  test("resolution never crashes on a marker pruned between listing and read") {
    // every publish (retain = 2) prunes a marker, so a reader listing
    // markers in a tight loop repeatedly races the delete — the
    // ADVICE r15 gap was resolution crashing with FileNotFoundException
    // in exactly that window (the race fires probabilistically; the
    // assertion is that however often it fires, resolution still answers)
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    VersionedPublish.publish(spark, root)(writeArtifact(_, "seed")): Unit
    val pool = Executors.newFixedThreadPool(1)
    val writer = pool.submit(new Runnable {
      def run(): Unit = (0 until 60).foreach { i =>
        VersionedPublish.publish(spark, root)(writeArtifact(_, s"v$i")): Unit
      }
    })
    var resolutions = 0L
    while (!writer.isDone) {
      // must never throw; with retain = 2 a vanished-mid-read marker
      // always leaves the newer one resolvable (a None would need two
      // complete publishes inside the reader's listing-to-open window)
      assert(VersionedPublish.currentDir(spark, root).nonEmpty)
      assert(VersionedPublish.currentDirLocal(root).nonEmpty)
      resolutions += 1
    }
    writer.get(60, TimeUnit.SECONDS): Unit
    pool.shutdown()
    assert(resolutions > 0L)
  }

  test("retain guard") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    intercept[IllegalArgumentException](
      VersionedPublish.publish(spark, root, retain = 0)(writeArtifact(_, "x")))
  }
}
