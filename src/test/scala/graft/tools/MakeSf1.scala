package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** sf1 validation twin (r15 verdict #5): a 10× scale-up of the sf0.1
  * testdata, written to `target/sf1/` so the SCALING exponents get a
  * second decade (sf0.1 → sf1) on top of the committed sf0.01 → sf0.1
  * leg. The driver's generator is not available in-sandbox, so this is
  * a structure-preserving synthetic twin:
  *
  *  - TPC-H-ish tables replicate 10× with CONSISTENT key strides
  *    (orders.o_custkey moves with customer.c_custkey, lineitem's three
  *    FKs move with their parents, events.user_id moves with customer)
  *    so every join's selectivity and fan-out is preserved at 10× rows;
  *    region/nation stay fixed (dimension tables do not scale in TPC-H
  *    either).
  *  - documents replicate 10× with a replica-tag token INSERTED every
  *    5th token: within-replica near-dup structure is byte-preserved,
  *    while cross-replica twins share only ~40% of their 3-gram
  *    shingles (Jaccard ~0.25, far below the 0.8 mining threshold) —
  *    so the dedup family's true-pair count scales ~linearly like a
  *    genuinely grown corpus, not quadratically like the replication
  *    stress leg (which exists separately and covers that worst case).
  *  - embeddings replicate 10× with a per-replica CIRCULAR SHIFT of the
  *    vector: norms (and hence within-replica geometry) are exactly
  *    preserved, cross-replica directions decorrelate.
  *
  * Run: sbt "Test/runMain graft.tools.MakeSf1 [srcDir] [outDir]"
  */
object MakeSf1 {
  val REPS = 10
  // strides comfortably above each table's sf0.1 key range
  val CUST = 1000000L
  val SUPP = 1000000L
  val PART = 1000000L
  val ORD = 10000000L
  val DOC = 10000000L
  val VEC = 10000000L
  val EVT = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/sf1")
    val spark = GraftSession.local("graft-make-sf1", 32)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(out).mkdirs()

    def t(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"  wrote $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    def reps(build: Int => DataFrame): DataFrame =
      (0 until REPS).map(build).reduce(_ unionByName _)

    // fixed dimensions
    write(t("region"), "region")
    write(t("nation"), "nation")

    write(reps { i =>
      t("customer").withColumn("c_custkey", col("c_custkey") + lit(i * CUST))
    }, "customer")
    write(reps { i =>
      t("supplier").withColumn("s_suppkey", col("s_suppkey") + lit(i * SUPP))
    }, "supplier")
    write(reps { i =>
      t("part").withColumn("p_partkey", col("p_partkey") + lit(i * PART))
    }, "part")
    write(reps { i =>
      t("orders")
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * ORD))
        .withColumn("o_custkey", col("o_custkey") + lit(i * CUST))
    }, "orders")
    write(reps { i =>
      t("lineitem")
        .withColumn("l_orderkey", col("l_orderkey") + lit(i * ORD))
        .withColumn("l_partkey", col("l_partkey") + lit(i * PART))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * SUPP))
    }, "lineitem")
    write(reps { i =>
      t("events")
        .withColumn("event_id", col("event_id") + lit(i * EVT))
        .withColumn("user_id", col("user_id") + lit(i * CUST))
    }, "events")

    // documents: replica-tag token every 5th token (see scaladoc)
    write(reps { i =>
      val tagged = expr(
        s"""array_join(
           |  zip_with(
           |    split(text, ' '),
           |    sequence(0, size(split(text, ' ')) - 1),
           |    (tk, ix) -> CASE WHEN ix % 5 = 4
           |      THEN concat(tk, ' zzr${i}x', cast(ix % 17 as string))
           |      ELSE tk END),
           |  ' ')""".stripMargin)
      t("documents")
        .withColumn("doc_id", col("doc_id") + lit(i * DOC))
        .withColumn("text", if (i == 0) col("text") else tagged)
        .withColumn("n_chars", length(col("text")))
    }, "documents")

    // embeddings: per-replica circular shift (norm-preserving)
    write(reps { i =>
      val d = 64
      val s = i % d
      val shifted =
        if (s == 0) col("embedding")
        else concat(slice(col("embedding"), s + 1, d - s),
          slice(col("embedding"), 1, s))
      t("embeddings")
        .withColumn("vec_id", col("vec_id") + lit(i * VEC))
        .withColumn("embedding", shifted)
    }, "embeddings")

    println(s"sf1 twin complete at $out")
    spark.stop()
  }
}
