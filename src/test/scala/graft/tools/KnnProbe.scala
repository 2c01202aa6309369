package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.llm.Similarity

/** Scratch probe (not a spec): candidate budget + recall of uniform vs
  * mixed per-table plane configs for knnGraphExactInt on the sf0.001
  * embeddings — picks the config pair the recall spec asserts.
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("knn-probe", 8)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val exact = Similarity.int8TopK(e, e, 5)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    def probe(pp: Seq[Int]): Unit = {
      val g = Similarity.knnGraphExactInt(e, 5, 64, pp, 42L, 4096)
        .select("id", "nbr_id").as[(Long, Long)].collect().toSet
      val v = Similarity.int8Codes(e)
        .select(col("id"), col("codes").cast("array<double>").as("cv"),
          col("maxabs_micro").as("mxv"))
      val cand = Similarity.knnExactCandidates(v, 64, pp, 42L, 4096).count()
      val rec = (exact intersect g).size.toDouble / exact.size
      println(f"planes=${pp.mkString(",")}%-10s cand=$cand%7d recall=$rec%.3f")
    }
    Seq(Seq(5, 5), Seq(6, 6), Seq(7, 7), Seq(4, 8), Seq(4, 10), Seq(4, 12),
      Seq(5, 8), Seq(3, 12), Seq(4, 4), Seq(8, 8), Seq(4, 6))
      .foreach(probe)

    // two-tier clustered corpus: 60 clusters x 8 moderately-tight members,
    // each with a near-twin tier inside (LLM-embedding-like structure)
    println("== clustered ==")
    def lcg(s: Long): Long = (s * 6364136223846793005L + 1442695040888963407L)
    val dim = 64
    val rows = (0 until 60).flatMap { c =>
      val cs = lcg(c + 1)
      val center = Array.tabulate(dim)(i =>
        ((lcg(cs + i) >>> 11).toDouble / (1L << 53) - 0.5))
      (0 until 8).map { m =>
        val ms = lcg(cs + 1000 + m)
        val sigma = if (m % 2 == 1) 0.02 else 0.15 // twin tier + loose tier
        val v = Array.tabulate(dim)(i => center(i) +
          sigma * ((lcg(ms + i) >>> 11).toDouble / (1L << 53) - 0.5))
        (c * 8L + m, v.toSeq)
      }
    }
    val cdf = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint()
    val cexact = Similarity.int8TopK(cdf, cdf, 3)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    def cprobe(pp: Seq[Int]): Unit = {
      val g = Similarity.knnGraphExactInt(cdf, 3, dim, pp, 42L, 4096)
        .select("id", "nbr_id").as[(Long, Long)].collect().toSet
      val v = Similarity.int8Codes(cdf)
        .select(col("id"), col("codes").cast("array<double>").as("cv"),
          col("maxabs_micro").as("mxv"))
      val cand = Similarity.knnExactCandidates(v, dim, pp, 42L, 4096).count()
      val rec = (cexact intersect g).size.toDouble / cexact.size
      println(f"planes=${pp.mkString(",")}%-10s cand=$cand%7d recall=$rec%.3f")
    }
    Seq(Seq(4, 4), Seq(5, 5), Seq(6, 6), Seq(7, 7), Seq(8, 8),
      Seq(4, 12), Seq(4, 10), Seq(5, 12), Seq(5, 10), Seq(6, 12),
      Seq(3, 12), Seq(4, 8), Seq(6, 10)).foreach(cprobe)
    spark.stop()
  }
}
