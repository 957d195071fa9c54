package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import graft.operators.{Canonicalizer, Dedup}

/** Cold-run profile of the portable minhash query, optionally preceded by
  * the bench entries that run before it (to reproduce the in-bench
  * context). args: any of "cc" "kgsf" before timing. */
object ProbeR6c {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchShapes.session()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        stages += ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.executorRunTime, si.taskMetrics.jvmGCTime,
          si.numTasks))
      }
    })
    if (args.contains("cc")) {
      val t0 = System.nanoTime()
      Canonicalizer.connectedComponents(spark,
        BenchShapes.cc600kEdges(spark), smallGraphThreshold = 0L).count()
      println(f"PROBE pre cc_600k: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    if (args.contains("kgsf")) {
      val t0 = System.nanoTime()
      Pipeline.triples(spark,
        sources.InterleavedDocs.fromDocuments(spark, sfDir)).count()
      println(f"PROBE pre kg_sfdocs: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    stages.clear()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val n = Dedup.minHashLshPairs(docs, 3, 64, 16, 0.5,
      maxDocFreq = graft.model.Spec.DedupMaxDocFreq, portable = true).count()
    println(f"PROBE cold minhash_lsh: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    stages.sortBy(-_._3).take(3).foreach { case (id, w, rt, gc, nt) =>
      println(f"  stage $id%-3d wall=${w/1e3}%6.2fs taskrun=${rt/1e3}%7.2fs gc=${gc/1e3}%5.2fs ntasks=$nt")
    }
    spark.stop()
  }
}
