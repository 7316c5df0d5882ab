package graft
import org.apache.spark.sql.SparkSession
/** Dev smoke: flagship entry + reference-corpus text jobs. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession
      .builder("local[8]", 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.prepare(spark)

    val e = SparkEntry.entry(spark)
    println("entry rows=" + e.count())
    e.show(3, false)

    val wc = operators.TextJobs.wordCountDir(spark, "/root/reference/input/small")
    println("wc(small) distinct words=" + wc.count())
    wc.show(5, false)

    val ii = operators.TextJobs.invertedIndexDir(spark, "/root/reference/input/large")
    println("ii(large) distinct words=" + ii.count())
    ii.filter(org.apache.spark.sql.functions.col("word") === "the").show(2, 120)

    spark.stop()
  }
}
