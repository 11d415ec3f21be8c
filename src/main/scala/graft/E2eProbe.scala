package graft
import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Round-16 diagnostic: replay the e2e deployment once under the Bench
  * session config and attribute its Spark jobs to the [[serving
  * .LivePipeline.processBatch]] phase labels (guide §1.5) — job count and
  * summed job wall per phase, the numbers that show where the
  * job-count-bound e2e cell actually spends its 400+ jobs. */
object E2eProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = mutable.Map.empty[Int, (String, Long)]
    val agg = mutable.Map.empty[String, (Int, Long)] // desc -> (jobs, ms)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("<none>")
        // strip the batch id so phases aggregate across batches
        val key = desc.replaceAll("live-batch \\d+: ", "")
        starts(j.jobId) = (key, j.time)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (key, t0) =>
          val (n, ms) = agg.getOrElse(key, (0, 0L))
          agg(key) = (n + 1, ms + (j.time - t0))
        }
    })

    val t0 = System.nanoTime()
    val n = SparkEntry.queries("e2e_live_pipeline")(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(400)
    println(f"[e2eprobe] rows=$n wall=$wall%.1f s, jobs by phase:")
    agg.toSeq.sortBy(-_._2._2).foreach { case (k, (jobs, ms)) =>
      println(f"[e2eprobe]   $k%-20s jobs=$jobs%4d  wall=${ms / 1000.0}%7.2f s")
    }
    println(f"[e2eprobe] total jobs=${agg.values.map(_._1).sum}, " +
      f"summed job wall=${agg.values.map(_._2).sum / 1000.0}%.2f s")
    spark.stop()
  }
}
