package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool: run the named streaming-replay queries and print each
  * micro-batch's durationMs breakdown (triggerExecution, queryPlanning,
  * addBatch, state-store commit times) from the progress events — the
  * measurement the r21 verdict asked for before touching the streaming
  * family ("measure where the per-batch time goes").
  *
  * Usage: StreamProfile <query...> */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val names = args.toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val events =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        val state = p.stateOperators.map { so =>
          s"{op:${so.operatorName}, commitMs:${so.commitTimeMs}, " +
            s"rows:${so.numRowsTotal}, mem:${so.memoryUsedBytes}}"
        }.mkString("[", " ", "]")
        events.add(s"  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durationMs=$dur state=$state")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    for (q <- Registry.specs.sortBy(_.name) if names.contains(q.name)) {
      for (run <- Seq("cold", "warm")) {
        events.clear()
        val t0 = System.nanoTime()
        q.fn(spark, dir).queryExecution.toRdd
          .foreachPartition(it => while (it.hasNext) { it.next(); () })
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment to drain
        Thread.sleep(300)
        println(f"${q.name} $run: $wall%.2f s")
        events.forEach(e => println(e))
      }
    }
    spark.stop()
  }
}
