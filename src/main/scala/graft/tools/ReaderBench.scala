package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ReaderBench {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val delim = graft.sources.CorpusSources.RecordDelimiter
    def time(tag: String)(f: => Long): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"[rb] $tag rep$i ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    time("builtin")(spark.read.option("lineSep", delim).text(path)
      .agg(sum(length(col("value")))).head().getLong(0))
    time("dsv2-8mb")(spark.read.format("vspace-corpus")
      .option("chunkBytes", (8L<<20).toString).load(path)
      .agg(sum(length(col("text")))).head().getLong(0))
    spark.stop()
  }
}
