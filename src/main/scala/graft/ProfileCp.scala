package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
object ProfileCp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = mutable.ListBuffer.empty[(Int, Long, Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId, ms, si.numTasks, si.taskMetrics.executorRunTime))
      }
    })
    val d = "/root/testdata/sf0.1"
    def run(name: String): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      val secs = (System.nanoTime()-t0)/1e9
      Thread.sleep(300)
      val top = stages.sortBy(-_._2).take(3).map { case (id, ms, t, rt) =>
        s"stage$id=${ms}ms/tasks=$t/cpu=${rt}ms" }.mkString(" ")
      println(f"[prof] $name%-20s $secs%6.2f s   $top")
    }
    run("llm_dedup_ngram")
    Seq("llm_ann_lsh", "llm_ann_ivf", "llm_dedup_embed", "llm_dedup_minhash",
      "llm_corpus_clean", "llm_corpus_stats", "llm_dedup_simhash").foreach(run)
    run("llm_dedup_ngram")
    run("llm_dedup_ngram")
    spark.stop()
  }
}
