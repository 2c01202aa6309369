package graft.tools

import graft.GraftSession

/** Job-level census of representative gate drains: every Spark job fired
  * during one measured drain (count, wall, phase tag) plus the
  * per-trigger StreamingQueryProgress durationMs breakdown, then a
  * REPEAT-style wall-time summary — the measurement the r15 verdict
  * asked for around the streaming family's fixed machinery. Run:
  *   sbt "Test/runMain graft.tools.DrainJobProbe [sfDir] [reps]"
  */
object DrainJobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-drain-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.StreamStaging.prebuild(spark, dir)

    final case class Job(id: Int, ms: Long, desc: String)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[Job]()
    val starts = new java.util.concurrent.ConcurrentHashMap[
      Integer, (Long, String)]()
    @volatile var capture = false
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (capture) starts.put(e.jobId,
            (System.nanoTime(),
              Option(e.properties)
                .map(_.getProperty("spark.job.description", "")).getOrElse("")
                .replaceAll("[\\s]+", " ").take(70)))
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(e.jobId)
          if (s != null)
            jobs.add(Job(e.jobId, (System.nanoTime() - s._1) / 1000000, s._2))
        }
      })

    def probe(label: String)(
        run: (org.apache.spark.sql.streaming.StreamingQuery => Unit) =>
          org.apache.spark.sql.DataFrame): Unit = {
      run(_ => ()).count() // warm
      // census run
      jobs.clear(); starts.clear()
      var progress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
        Array.empty
      capture = true
      val t0 = System.nanoTime()
      run(q => progress = q.recentProgress).count()
      val censusWall = (System.nanoTime() - t0) / 1e9
      capture = false
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_.id)
      println(f"%n== $label census: wall=$censusWall%.2fs " +
        f"jobs=${js.size} jobms_sum=${js.map(_.ms).sum}")
      js.foreach(j => println(f"   job ${j.ms}%6dms  ${j.desc}"))
      progress.foreach { p =>
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2).take(5).map {
          case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"   trigger batch=${p.batchId} rows=${p.numInputRows} $d")
      }
      // repeat runs for a stable min/median
      val ts = (1 to reps).map { _ =>
        val t = System.nanoTime()
        run(_ => ()).count()
        (System.nanoTime() - t) / 1e9
      }
      println(f"   reps: ${ts.map(t => f"$t%.2f").mkString(" ")}  " +
        f"min=${ts.min}%.2f med=${ts.sorted.apply(ts.size / 2)}%.2f")
    }

    val S = graft.streaming.StreamingPipeline
    probe("window_update (update-merge, watermark)") { onFin =>
      S.streamWindowUpdate(spark, dir, onFinish = onFin) }
    probe("tws (update-merge, arbitrary state)") { _ =>
      S.streamUserCountsTws(spark, dir) }
    probe("dedup_update (update-merge)") { _ =>
      S.streamDedupUpdate(spark, dir) }
    probe("topk_update (update-merge)") { _ =>
      S.streamTopKUpdate(spark, dir) }
    probe("funnel (update-merge, fMGWS)") { _ =>
      S.streamFunnel(spark, dir) }
    probe("interval_join (append sink)") { _ =>
      S.streamIntervalJoin(spark, dir) }
    probe("interval_join_outer (append sink, sentinel)") { onFin =>
      S.streamIntervalJoinOuter(spark, dir) }
    probe("sessionize_append (append sink, sentinel)") { _ =>
      S.streamSessionizeAppend(spark, dir) }
    probe("topk (complete/memory sink)") { _ =>
      S.streamTopKWords(spark, dir) }
    println("[drainprobe] done")
    spark.stop()
  }
}
