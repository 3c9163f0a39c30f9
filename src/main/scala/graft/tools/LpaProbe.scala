package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Throwaway probe: rounds-to-fixpoint of the synchronous LPA over a
  * persisted co-order edge table (pass parquet dirs as args). */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    for (d <- args) {
      val edges = spark.read.parquet(d)
      var prev = graft.rel.RelQueries.lpaOf(edges, 1)
      var r = 1
      var moving = true
      while (moving && r < 30) {
        val next = graft.rel.RelQueries.lpaOf(edges, r + 1)
        val moved = prev.as("a")
          .join(next.as("b"), col("a.node") === col("b.node"))
          .filter(col("a.lbl") =!= col("b.lbl")).count()
        println(s"LPAPROBE $d round $r->${r + 1}: moved=$moved")
        moving = moved > 0; prev = next; r += 1
      }
    }
    spark.stop()
  }
}
