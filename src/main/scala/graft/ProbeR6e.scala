package graft

import org.apache.spark.scheduler._
import graft.operators.Canonicalizer

/** Cold stage profile of the cc_600k bench entry. */
object ProbeR6e {
  def main(args: Array[String]): Unit = {
    val spark = BenchShapes.session()
    spark.sparkContext.setLogLevel("WARN")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        stages += ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    val t0 = System.nanoTime()
    val n = Canonicalizer.connectedComponents(spark,
      BenchShapes.cc600kEdges(spark), smallGraphThreshold = 0L).count()
    println(f"PROBE cc_600k cold: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    stages.sortBy(-_._3).take(8).foreach { case (id, w, rt, nt) =>
      println(f"  stage $id%-3d wall=${w/1e3}%6.2fs taskrun=${rt/1e3}%7.2fs ntasks=$nt")
    }
    spark.stop()
  }
}
