package graft.core

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.hadoop.fs.Path
import graft.SparkSpec

/** Multi-process contract of [[VersionedPublish]] (VERDICT r14 missing
  * #1): the shared serve indexes are published MVCC-style so concurrent
  * readers/writers on one scratch root can never tear a read. The
  * "process" here is modeled by threads — the mechanism under test is
  * filesystem-level (immutable version dirs + atomic rename commit +
  * highest-committed resolution), which is process-agnostic. */
class VersionedPublishSpec extends SparkSpec {

  private def fs = new Path("/").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def writeArtifact(dir: String, body: String): Unit = {
    Files.createDirectories(java.nio.file.Paths.get(dir))
    // two files: a torn read (one file from v0, one from v1, or a
    // missing file) is detectable because both must agree
    Files.write(java.nio.file.Paths.get(dir, "a.txt"), body.getBytes("UTF-8"))
    Files.write(java.nio.file.Paths.get(dir, "b.txt"), body.getBytes("UTF-8")): Unit
  }
  private def readArtifact(dir: String): (String, String) = (
    new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "a.txt")), "UTF-8"),
    new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "b.txt")), "UTF-8"))

  test("first publish commits v0; getOrPublish then resolves build-free") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    var builds = 0
    val d0 = VersionedPublish.getOrPublish(spark, root) { st =>
      builds += 1; writeArtifact(st, "v0") }
    assert(d0.endsWith("/v0") && readArtifact(d0) == (("v0", "v0")))
    val d1 = VersionedPublish.getOrPublish(spark, root) { st =>
      builds += 1; writeArtifact(st, "never") }
    assert(d1 == d0 && builds == 1, "second getOrPublish must not rebuild")
  }

  test("republish commits v1; old version stays readable (retain=2)") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    val d0 = VersionedPublish.publish(spark, root)(writeArtifact(_, "v0"))
    val d1 = VersionedPublish.publish(spark, root)(writeArtifact(_, "v1"))
    assert(d1.endsWith("/v1"))
    assert(VersionedPublish.currentDir(spark, root).contains(d1))
    // a reader holding v0 across the republish still reads it complete
    assert(readArtifact(d0) == (("v0", "v0")))
    // a third publish prunes v0 (retain = 2 keeps v1, v2)
    VersionedPublish.publish(spark, root)(writeArtifact(_, "v2")): Unit
    assert(!fs.exists(new Path(d0)))
    assert(readArtifact(d1) == (("v1", "v1")))
  }

  test("a crashed build's staging dir is invisible to resolution") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    VersionedPublish.publish(spark, root)(writeArtifact(_, "v0")): Unit
    writeArtifact(s"$root/v1_build_deadprocess", "torn")
    assert(VersionedPublish.currentDir(spark, root).exists(_.endsWith("/v0")),
      "orphan staging must never resolve as live")
    val d1 = VersionedPublish.publish(spark, root)(writeArtifact(_, "v1"))
    assert(d1.endsWith("/v1") && readArtifact(d1) == (("v1", "v1")))
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
      assert(a == b && (a == "v0" || a == "v1"),
        s"torn read: ($a, $b) at $dir")
      seen += a
    }
    writer.get(30, TimeUnit.SECONDS): Unit
    pool.shutdown()
    assert(seen.contains("v0"), "poll loop should observe the old version")
    val (a, b) = readArtifact(VersionedPublish.currentDir(spark, root).get)
    assert((a, b) == (("v1", "v1")))
  }

  test("two writers racing on an empty root both end with a complete artifact") {
    val root = Files.createTempDirectory("vpub").toString + "/idx"
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val fills = (0 until 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = {
          gate.await()
          VersionedPublish.getOrPublish(spark, root)(writeArtifact(_, s"w$i"))
        }
      })
    }
    gate.countDown()
    val dirs = fills.map(_.get(30, TimeUnit.SECONDS))
    pool.shutdown()
    dirs.foreach { d =>
      val (a, b) = readArtifact(d)
      assert(a == b && a.startsWith("w"), s"torn artifact at $d: ($a, $b)")
    }
    // resolution converges: the live dir is one complete artifact
    val live = VersionedPublish.currentDir(spark, root).get
    val (a, b) = readArtifact(live)
    assert(a == b)
  }
}
