package graft.tools

import graft.Registry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-only: [[QueryProfile]] plus a per-stage cost table — for each
  * completed stage of the LAST (warm) rep: wall-clock, summed task
  * time, task count and the stage's name (which carries the first
  * line of the physical node it ran). This is how a 6-second query
  * over 17 MB of input gets located to its dominant stage without the
  * UI (spark.ui.enabled=false everywhere in this sandbox).
  *
  * Usage: StageProfile <query> [sfDir] [reps]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = Registry.specs.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    graft.LsdDb.standardTables
      .foreach(t => graft.LsdDb.table(spark, dir, t).count())
    graft.operators.Aggregates.qAggBasic.fn(spark, dir).count()

    final case class Row(wallMs: Long, taskMs: Long, cpuMs: Long,
                         gcMs: Long, nTasks: Int, recIn: Long,
                         recOut: Long, name: String)
    val stages = mutable.ArrayBuffer.empty[Row]
    val listener = new SparkListener {
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {
          a <- i.completionTime; b <- i.submissionTime
        } yield a - b).getOrElse(-1L)
        // the RDD scopes carry the physical-operator names — the only
        // stage→plan mapping available with the UI disabled
        val ops = i.rddInfos.flatMap(_.scope).map { sc =>
          sc.name.takeWhile(_ != '\n')
        }.distinct.mkString(" <- ")
        stages.synchronized {
          stages += Row(wall, i.taskMetrics.executorRunTime,
            i.taskMetrics.executorCpuTime / 1000000,
            i.taskMetrics.jvmGCTime, i.numTasks,
            i.taskMetrics.shuffleReadMetrics.recordsRead,
            i.taskMetrics.shuffleWriteMetrics.recordsWritten,
            ops.take(200))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (r <- 0 until reps) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      q.fn(spark, dir).queryExecution.toRdd
        .foreachPartition(it => while (it.hasNext) { it.next(); () })
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"$name rep$r: $dt%.2f s")
      val rows = stages.synchronized(stages.sortBy(-_.wallMs)).toList
      println("-- stages (wall | task | cpu | gc | tasks | recIn | recOut | name)")
      rows.takeWhile(_.wallMs > 200).take(8).foreach { s =>
        println(f"${s.wallMs}%7d | ${s.taskMs}%7d | ${s.cpuMs}%7d | " +
          f"${s.gcMs}%5d | ${s.nTasks}%5d | ${s.recIn}%9d | " +
          f"${s.recOut}%9d | ${s.name}")
      }
      println(f"-- total stage wall: ${rows.map(_.wallMs).sum} ms over " +
        s"${rows.size} stages")
    }
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
