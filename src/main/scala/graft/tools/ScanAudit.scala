package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off audit: executed-plan parquet-scan counts per graded query
  * (flags avoidable fact re-scans; keep — cheap to re-run per round). */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
        val tables = plan.linesIterator.filter(_.contains("Scan parquet")).toSeq
          .map(l => "([a-z_]+)\\.parquet".r.findFirstMatchIn(l).map(_.group(1)).getOrElse("?"))
        val dup = tables.groupBy(identity).filter(_._2.length > 1)
          .map { case (t, g) => s"$t x${g.length}" }.mkString(",")
        if (dup.nonEmpty) println(s"SCANAUDIT $name DUP $dup")
      } catch { case e: Exception => println(s"SCANAUDIT $name ERR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
