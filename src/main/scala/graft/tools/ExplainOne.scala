package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted executed plan of the queries named in
  * `SPARK_GRAFT_ONLY` (comma-separated) at the dir in
  * `SPARK_GRAFT_SF_DIR` (default sf0.01) — the explain-and-iterate
  * loop's tool: check WholeStageCodegen spans, PushedFilters, exchange
  * placement for one query without editing any source. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    for (q <- names) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(s"==== $q ====")
      df.explain("formatted")
    }
    spark.stop()
  }
}
