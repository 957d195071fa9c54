package graft

import graft.operators.Dedup

object ProbeR6d {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchShapes.session()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = Dedup.minHashLshPairs(docs, 3, 64, 16, 0.5,
      maxDocFreq = graft.model.Spec.DedupMaxDocFreq, portable = true)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/r6_minhash_exec.txt"), plan)
    println("PROBE wrote /tmp/r6_minhash_exec.txt " + plan.length)
  }
}
