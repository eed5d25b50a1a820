package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level empirical profile of one registry entry (guide §1.1: find
  * where the time goes before changing anything — the Spark UI is
  * disabled in this sandbox, so a listener prints the same facts):
  * `runMain graft.JobProfile <query> [reps]` executes the entry with a
  * noop sink and prints one line per Spark job — duration, stage count,
  * task count, shuffle read/write bytes, and the job group/description
  * — plus a total. Construction-time jobs (eager localCheckpoints,
  * staged builds) are included: they are part of what the bench times.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class Job(id: Int, var desc: String, var started: Long = 0L,
      var ended: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
      var shufR: Long = 0L, var shufW: Long = 0L, var input: Long = 0L)
    val jobs = scala.collection.concurrent.TrieMap[Int, Job]()
    val stageToJob = scala.collection.concurrent.TrieMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        val j = Job(e.jobId, d, started = e.time, stages = e.stageIds.length)
        jobs(e.jobId) = j
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.ended = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
          j.tasks += si.numTasks
          j.shufR += si.taskMetrics.shuffleReadMetrics.totalBytesRead
          j.shufW += si.taskMetrics.shuffleWriteMetrics.bytesWritten
          j.input += si.taskMetrics.inputMetrics.bytesRead
          if (j.desc.isEmpty) j.desc = si.name.take(90)
        }
        // Slow stages: print the first repo frame of the submission
        // site so AQE's generic future callsite doesn't hide the
        // operator (details carries the full stack).
        val durMs = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        if (durMs >= 250) {
          val frame = si.details.split('\n')
            .find(l => l.contains("graft.") && !l.contains("JobProfile"))
            .getOrElse(si.name).trim
          val scopes = si.rddInfos.flatMap(_.scope).map(_.name).distinct
            .mkString("|")
          println(f"  [stage ${si.stageId} ${durMs / 1e3}%.3fs " +
            f"tasks=${si.numTasks}] ${si.name.take(60)} @ $frame :: $scopes")
        }
      }
    })
    def runOnce(tag: String): Unit = {
      jobs.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      // "ingest:<n>" profiles Bench's near-ingest body (not a registry
      // entry): n synthetic blocks -> 17-table ETL, noop sink each.
      if (name.startsWith("ingest:")) {
        val nBlocks = name.stripPrefix("ingest:").toInt
        val norm = graft.near.Ingest.blocksFromJson(spark,
          graft.near.Fixtures.syntheticChain(nBlocks)).toDF()
        graft.near.Ingest.allTables(norm.persist()).values.foreach(df =>
          df.write.mode("overwrite").format("noop").save())
        norm.unpersist()
      } else Bench.withBenchConf(spark, name) {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      // Deterministic drain (was a sleep-race: late JobEnd events under
      // load landed after the print / after jobs.clear() — r20 ADVICE).
      org.apache.spark.graft.ListenerSync.drain(spark.sparkContext)
      println(f"== $tag $name wall=$wall%.3f s, ${jobs.size} jobs ==")
      val js = jobs.values.toSeq.sortBy(_.id)
      js.foreach { j =>
        val dur = (j.ended - j.started) / 1e3
        println(f"job ${j.id}%3d ${dur}%8.3fs stages=${j.stages}%2d " +
          f"tasks=${j.tasks}%4d in=${j.input / 1024}%8dK " +
          f"shR=${j.shufR / 1024}%7dK shW=${j.shufW / 1024}%7dK  ${j.desc.take(80)}")
      }
      println(f"sum(job durations)=${js.map(j => j.ended - j.started).sum / 1e3}%.3f s")
    }
    runOnce("warmup")
    (1 to reps).foreach(i => runOnce(s"rep$i"))
    spark.stop()
  }
}
