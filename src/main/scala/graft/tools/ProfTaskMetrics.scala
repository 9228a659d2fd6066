package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Dev tool: run a declared query and aggregate per-stage task metrics —
  * the spill/GC evidence the q203 contention investigation needs (VERDICT
  * r12 item 1: "read the spill/GC task metrics"). Prints, per stage:
  * tasks, executor run time, JVM GC time, shuffle read/write bytes,
  * memory/disk spill bytes, peak execution memory (max over tasks).
  *
  * Args: sfDir query [query...] — each query may repeat for warm runs.
  * Optional env PROF_LOAD=N spawns N busy-spin threads INSIDE the JVM
  * for the duration of the run, the synthetic-contention reproduction
  * protocol (the driver's bench contention is external, but in-JVM
  * spinners starve the same task threads and the GC the same way while
  * staying self-contained). */
object ProfTaskMetrics {
  private final case class Agg(var tasks: Long = 0, var runMs: Long = 0,
      var gcMs: Long = 0, var shufReadB: Long = 0, var shufWriteB: Long = 0,
      var memSpillB: Long = 0, var diskSpillB: Long = 0, var peakMem: Long = 0,
      var resultMs: Long = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    require(new java.io.File(sfDir).isDirectory,
      s"first arg must be an existing sf data dir, got '$sfDir'")
    val names = args.drop(1)
    require(names.nonEmpty, "usage: ProfTaskMetrics <sfDir> <query> [query...]")

    val loadThreads = sys.env.get("PROF_LOAD").map(_.toInt).getOrElse(0)
    @volatile var spin = true
    val spinners = (0 until loadThreads).map { i =>
      val t = new Thread(() => {
        var x = 0L
        while (spin) { x += 1; if (x % 1000000L == 0) Thread.`yield`() }
      }, s"prof-spin-$i")
      t.setDaemon(true); t.start(); t
    }

    val spark = graft.core.EngineConf.configure(
        SparkSession.builder().master("local[32]"), 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stageId -> (name hint, agg); stage attempts merge into one row
    val stages = TrieMap[Int, Agg]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val a = stages.getOrElseUpdate(te.stageId, Agg())
          a.synchronized {
            a.tasks += 1
            a.runMs += m.executorRunTime
            a.gcMs += m.jvmGCTime
            a.shufReadB += m.shuffleReadMetrics.totalBytesRead
            a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
            a.memSpillB += m.memoryBytesSpilled
            a.diskSpillB += m.diskBytesSpilled
            a.peakMem = math.max(a.peakMem, m.peakExecutionMemory)
            a.resultMs += m.resultSerializationTime
          }
        }
      }
    })

    def mb(b: Long): String = f"${b / 1024.0 / 1024.0}%9.1f MB"
    names.zipWithIndex.foreach { case (name, i) =>
      stages.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"\n[prof] $name run#$i  wall=$sec%.2f s  load=$loadThreads spinners")
      println("stage  tasks    runtime      gc  shufRead    shufWrite    memSpill    diskSpill   peakMem")
      val rows = stages.toSeq.sortBy(_._1)
      rows.foreach { case (sid, a) =>
        println(f"$sid%5d  ${a.tasks}%5d  ${a.runMs / 1000.0}%7.1f s ${a.gcMs / 1000.0}%6.1f s ${mb(a.shufReadB)} ${mb(a.shufWriteB)} ${mb(a.memSpillB)} ${mb(a.diskSpillB)} ${mb(a.peakMem)}")
      }
      val tot = Agg()
      rows.foreach { case (_, a) =>
        tot.tasks += a.tasks; tot.runMs += a.runMs; tot.gcMs += a.gcMs
        tot.shufReadB += a.shufReadB; tot.shufWriteB += a.shufWriteB
        tot.memSpillB += a.memSpillB; tot.diskSpillB += a.diskSpillB
        tot.peakMem = math.max(tot.peakMem, a.peakMem)
      }
      println(f"TOTAL  ${tot.tasks}%5d  ${tot.runMs / 1000.0}%7.1f s ${tot.gcMs / 1000.0}%6.1f s ${mb(tot.shufReadB)} ${mb(tot.shufWriteB)} ${mb(tot.memSpillB)} ${mb(tot.diskSpillB)} ${mb(tot.peakMem)}")
      spark.catalog.clearCache()
    }
    spin = false
    spinners.foreach(_.join(1000))
    spark.stop()
  }
}
