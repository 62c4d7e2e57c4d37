package graft
import org.apache.spark.sql.SparkSession
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.operators.EmbeddingOps.quantized(
      Tables.embeddings(spark, "/root/testdata/sf0.001"))
    q.select("vec_id", "scale", "q").write.mode("overwrite")
      .parquet("/tmp/quant_probe")
    println("schema: " + spark.read.parquet("/tmp/quant_probe").schema.simpleString)
    spark.stop()
  }
}
