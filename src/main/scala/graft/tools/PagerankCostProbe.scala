package graft.tools
import org.apache.spark.sql.SparkSession
/** Measurement for the r16 persist-or-not decision (VERDICT Next #6):
  * cold vs memoized cost of the purchase-graph pagerank family. */
object PagerankCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    for (d <- args; q <- Seq("graph_pagerank", "graph_trustrank",
                             "graph_pagerank_dyn")) {
      val t0 = System.nanoTime()
      graft.rel.RelQueries.queries(q)(spark, d).collect()
      val t1 = System.nanoTime()
      graft.rel.RelQueries.queries(q)(spark, d).collect()
      val t2 = System.nanoTime()
      println(f"PRCOST $d $q cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
