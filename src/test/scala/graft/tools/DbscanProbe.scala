package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Stage-level timing probe for q_dbscan_ann (r11 verdict chase): splits
  * the entry into candidate generation, exact scoring, and the role
  * derivation to localize the 10.7 s. Run:
  * sbt "Test/runMain graft.tools.DbscanProbe /root/testdata/sf0.1"
  */
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-dbscan-probe", 32)
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
    // warm the JVM/codegen once
    t("warmup full dbscanAnn") {
      graft.ops.llm.Similarity.dbscanAnn(e, 0.35, 4, Seq.fill(24)(2))
        .write.format("noop").mode("overwrite").save()
    }
    t("full dbscanAnn (warm)") {
      graft.ops.llm.Similarity.dbscanAnn(e, 0.35, 4, Seq.fill(24)(2))
        .write.format("noop").mode("overwrite").save()
    }
    // piecewise: candidate generation vs scoring vs role derivation
    val v = e.toDF("id", "vec")
    val codes = graft.ops.llm.Similarity.int8Codes(
        v.select(col("id"), col("vec")))
      .select(col("id"), col("codes").cast("array<double>").as("cv"))
      .localCheckpoint(true)
    val cand = t("annCandidatesMixed (count)") {
      val c = graft.ops.llm.Similarity.annCandidatesMixed(
        codes, 64, Seq.fill(24)(2), 42L, 4096)
      println(s"[probe] cand rows = ${c.count()}")
      c
    }
    // r17: the production path's ordered + int8-UB-prefiltered candidates
    t("annCandidatesMixed ordered+ub (count)") {
      val c = graft.ops.llm.Similarity.annCandidatesMixed(
        codes, 64, Seq.fill(24)(2), 42L, 4096,
        ubTau = Some(0.35), ordered = true)
      println(s"[probe] cand rows ordered+ub = ${c.count()} " +
        s"(old path a<b = ${cand.filter(col("a") < col("b")).count()})")
    }
    // sub-stage isolation of the candidate front-end
    locally {
      import org.apache.spark.sql.expressions.Window
      def mix64(z0: Long): Long = {
        var z = z0 + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val dim = 64; val seed = 42L
      def bucketOfInt(codesC: org.apache.spark.sql.Column, planes: Int,
                      tbl: Int) =
        (0 until planes).map { p =>
          val row = (0 until dim).map { i =>
            Math.floorMod(
              mix64(seed ^ (tbl * 1000003L) ^ (p * 8191L) ^ i.toLong),
              17L) - 8L
          }
          val d = graft.ops.llm.Similarity.dot(codesC,
            array(row.map(x => lit(x.toDouble)): _*))
          when(d >= 0d, lit(1L << p)).otherwise(lit(0L))
        }.reduce(_ + _)
      val planesPerTable = Seq.fill(24)(2)
      val keyed0 = codes.select(col("id"),
        explode(array(planesPerTable.zipWithIndex.map { case (np, tt) =>
          struct(lit(tt).as("tbl"),
            bucketOfInt(col("cv"), np, tt).as("bucket"))
        }: _*)).as("tb"))
        .select(col("id"), col("tb.tbl").as("tbl"),
          col("tb.bucket").as("bucket"))
      val keyed = t("keyed explode (materialize)") {
        val k = keyed0.localCheckpoint(true)
        println(s"[probe] keyed rows = ${k.count()}")
        k
      }
      val bw = Window.partitionBy("tbl2", "bucket2")
        .orderBy(xxhash64(col("tbl2"), col("bucket2"), col("b")), col("b"))
      val capped = t("cap window (materialize)") {
        val c = keyed.toDF("b", "tbl2", "bucket2")
          .withColumn("_br", row_number().over(bw))
          .filter(col("_br") <= 4096).drop("_br")
          .localCheckpoint(true)
        println(s"[probe] capped rows = ${c.count()}")
        c
      }
      val joined = t("bucket join, no distinct (count)") {
        val j = keyed.toDF("a", "tbl", "bucket").join(capped,
          col("tbl") === col("tbl2") && col("bucket") === col("bucket2") &&
            col("a") =!= col("b"))
          .select("a", "b")
        println(s"[probe] joined rows = ${j.count()}")
        j
      }
      t("distinct (count)") {
        val n = joined.distinct().count()
        println("[probe] distinct rows = " + n)
        n
      }
    }
    locally {
      val withVec = v.select(col("id"), col("vec"),
        graft.ops.llm.Similarity.l2norm(col("vec")).as("nv"))
      val scored = t("score + checkpoint pairs") {
        cand.filter(col("a") < col("b"))
          .join(withVec.select(col("id").as("a"), col("vec").as("va"),
            col("nv").as("na")), "a")
          .join(withVec.select(col("id").as("b"), col("vec").as("vb"),
            col("nv").as("nb")), "b")
          .filter(graft.ops.llm.Similarity.cosine(col("va"), col("vb"),
            col("na"), col("nb")) >= 0.35)
          .select(col("a"), col("b"))
          .localCheckpoint(true)
      }
      t("dbscanFromPairs on checkpointed pairs") {
        graft.ops.llm.Similarity.dbscanFromPairs(v, scored, 4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    t("cand -> cosine pairs (count)") {
      val withVec = v.select(col("id"), col("vec"),
        graft.ops.llm.Similarity.l2norm(col("vec")).as("nv"))
      val n = cand.filter(col("a") < col("b"))
        .join(withVec.select(col("id").as("a"), col("vec").as("va"),
          col("nv").as("na")), "a")
        .join(withVec.select(col("id").as("b"), col("vec").as("vb"),
          col("nv").as("nb")), "b")
        .filter(graft.ops.llm.Similarity.cosine(col("va"), col("vb"),
          col("na"), col("nb")) >= 0.35)
        .count()
      println(s"[probe] scored pairs = $n")
    }
    val pairsExact = t("exact all-pairs cosine (scan baseline)") {
      val w = v.select(col("id"), col("vec"),
        graft.ops.llm.Similarity.l2norm(col("vec")).as("nv"))
      val j = w.select(col("id").as("a"), col("vec").as("va"),
          col("nv").as("na"))
        .join(w.select(col("id").as("b"), col("vec").as("vb"),
          col("nv").as("nb")), col("a") < col("b"))
        .filter(graft.ops.llm.Similarity.cosine(col("va"), col("vb"),
          col("na"), col("nb")) >= 0.35)
        .select("a", "b")
      println(s"[probe] exact pairs = ${j.count()}")
      j
    }
    pairsExact.unpersist()
    spark.stop()
  }
}
