package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.{GraftSession, SparkEntry}

/** Per-job wall-time census for one declared query (r16 optimization
  * round): runs the query twice (warm + measured) with a listener that
  * records every Spark job's wall time and description — iterative
  * operators (Borůvka, CC, Lloyd) spend their time in many small jobs
  * that stage-level reasoning misses.
  *
  * Run: sbt "Test/runMain graft.tools.JobCensus <query> [sfDir] [cpus]"
  */
object JobCensus {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q_single_linkage")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = GraftSession.local("graft-job-census", cpus)
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val desc = Option(s.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(s.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (t0, desc) =>
          done.add((e.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
    })

    def run(label: String): Unit = {
      done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      val all = done.toArray(Array.empty[(Int, Double, String)]).sortBy(_._1)
      println(f"[census:$label] $q total ${dt}%.2f s, ${all.length} jobs, " +
        f"job-sum ${all.map(_._2).sum}%.2f s")
      all.foreach { case (id, t, d) =>
        println(f"[census:$label]   job $id%3d ${t}%7.3f s  ${d.take(90)}")
      }
    }
    run("warm")
    run("hot")
    spark.stop()
  }
}
