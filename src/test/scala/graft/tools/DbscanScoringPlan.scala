package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Prints the executed plan of q_dbscan_ann's candidate-scoring stage
  * (normally hidden inside the eager pair checkpoint) plus stage timings.
  * Run: sbt "Test/runMain graft.tools.DbscanScoringPlan /root/testdata/sf0.1"
  */
object DbscanScoringPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-dbscan-scoring", 32)
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.ops.llm.Similarity
    val e = graft.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
    val v = e.toDF("id", "vec")
    val dim = v.select(size(col("vec"))).head().getInt(0)
    val codes = S.int8Codes(v.select(col("id"), col("vec")))
      .select(col("id"), col("codes").cast("array<double>").as("cv"))
      .localCheckpoint(true)
    val cand = S.annCandidatesMixed(codes, dim, Seq.fill(24)(2), 42L, 4096)
      .filter(col("a") < col("b"))
      .localCheckpoint(true)
    println(s"[plan] cand rows = ${cand.count()}")
    val withVec = v.select(col("id"), col("vec"), S.l2norm(col("vec")).as("nv"))
    val pairs = cand
      .join(withVec.select(col("id").as("a"), col("vec").as("va"),
        col("nv").as("na")), "a")
      .join(withVec.select(col("id").as("b"), col("vec").as("vb"),
        col("nv").as("nb")), "b")
      .filter(S.cosine(col("va"), col("vb"), col("na"), col("nb")) >= 0.35)
      .select(col("a"), col("b"))
    val t0 = System.nanoTime()
    pairs.write.format("noop").mode("overwrite").save()
    println(f"[plan] scoring pass: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    pairs.write.format("noop").mode("overwrite").save()
    println(f"[plan] scoring pass (warm): ${(System.nanoTime() - t1) / 1e9}%.2f s")
    println(pairs.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
