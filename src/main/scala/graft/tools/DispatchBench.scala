package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
/** Side-by-side: per-pattern match loop vs compiled trie dispatch, at
  * small and large subscription counts (the scale argument for
  * MqttDispatchExpr). Usage: runMain graft.tools.DispatchBench */
object DispatchBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bus = graft.Tables.bus(spark, "/root/testdata/sf0.1")
    val small = Seq("cdc/#", "cdc/click/#", "cdc/error/#", "cdc/nosuch/#", "cdc/+/1")
    val types = Seq("click", "view", "error", "signup", "purchase")
    val big = small ++
      (0 until 150).map(u => s"cdc/+/$u") ++
      types.flatMap(t => (0 until 9).map(u => s"cdc/$t/$u"))
    for ((label, pats) <- Seq("k=5" -> small, s"k=${big.length}" -> big)) {
      def oldShape() = bus.select(explode(filter(
          array(pats.map(lit): _*), p => GraftFunctions.mqtt_matches(p, col("channel")))).as("pattern"))
        .groupBy(col("pattern")).agg(count(lit(1)).as("hits"))
      def newShape() = graft.cdc.CdcBus.matchCounts(bus, pats)
      for (r <- 1 to 4; (name, f) <- Seq("loop" -> (oldShape _), "trie" -> (newShape _))) {
        val t0 = System.nanoTime(); f().collect(); val dt = (System.nanoTime()-t0)/1e9
        if (r > 2) println(f"[dispatch] $label $name round$r: $dt%.3f s")
      }
    }
    spark.stop()
  }
}
