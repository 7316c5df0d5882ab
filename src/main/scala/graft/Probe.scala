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

    // sink surfaces: reference-format text + csv/json/partitioned parquet
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe").toString
    sources.Sources.writeKeyValueText(wc, "word", "cnt", s"$tmp/wc_text")
    println("text sink lines=" + spark.read.text(s"$tmp/wc_text").count())
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    sources.Sources.writeCsv(nation, s"$tmp/nation_csv")
    sources.Sources.writeJsonLines(nation, s"$tmp/nation_json")
    sources.Sources.writeParquet(nation, s"$tmp/nation_pq", partitionBy = Seq("n_regionkey"))
    println("csv rows=" + sources.Sources.csv(spark, s"$tmp/nation_csv", nation.schema).count() +
      " json rows=" + sources.Sources.jsonLines(spark, s"$tmp/nation_json", nation.schema).count() +
      " pq rows=" + sources.Sources.parquet(spark, s"$tmp/nation_pq").count())

    spark.stop()
  }
}
