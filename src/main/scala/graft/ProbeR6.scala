package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch decomposition probe for round-6 optimization (not part of any
  * contract surface; delete or keep as an audit tool). Times sub-stages of
  * the minhash pipeline in isolation with noop sinks. */
object ProbeR6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", 8L * 1024 * 1024)
      .config("spark.sql.files.openCostInBytes", 512L * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name: ${times.min}%.2f s")
    }

    val mdf = graft.model.Spec.DedupMaxDocFreq
    t("shingles") { Dedup.shingles(docs, 3, maxDocFreq = mdf) }
    t("sig_portable") {
      Dedup.minHashSignatures(Dedup.shingles(docs, 3, maxDocFreq = mdf),
        64, Dedup.portableHash60)
    }
    t("sig_xxhash") {
      Dedup.minHashSignatures(Dedup.shingles(docs, 3, maxDocFreq = mdf),
        64)
    }
    t("full_portable") {
      Dedup.minHashLshPairs(docs, 3, 64, 16, 0.5, maxDocFreq = mdf,
        portable = true)
    }
    t("full_xxhash") {
      Dedup.minHashLshPairs(docs, 3, 64, 16, 0.5, maxDocFreq = mdf)
    }
    spark.stop()
  }
}
