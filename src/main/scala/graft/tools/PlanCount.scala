package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("minhash_jaccard_est", "dedup_components", "pipeline_kept")) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val scans = "Scan parquet ".r.findAllIn(p).length
      val reused = "ReusedExchange".r.findAllIn(p).length
      println(s"PLANCOUNT $q: documents_scans=$scans reused_exchanges=$reused")
    }
    spark.stop()
  }
}
