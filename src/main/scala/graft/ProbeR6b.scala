package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

object ProbeR6b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", 8L * 1024 * 1024)
      .config("spark.sql.files.openCostInBytes", 512L * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(name: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name: ${times.min}%.2f s")
    }
    val w = split(col("text"), " ")
    val gen = docs.filter(size(w) >= 3)
      .select(col("doc_id").as("id"),
        explode(transform(sequence(lit(0), size(w) - 3),
          i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2),
            element_at(w, i + 3)))).as("shingle"))
    t("scan_only") { docs }
    t("generate_only") { gen }
    t("gen_distinct") { gen.distinct() }
    t("shingles_nofreq") { Dedup.shingles(docs, 3) }
    t("shingles_freq") { Dedup.shingles(docs, 3, maxDocFreq = 20L) }
    spark.stop()
  }
}
