package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** graft-avro DataSource V2 contract: lossless round-trips across the
  * supported type subset (primitives, nullable, binary, arrays, maps,
  * nested structs), schema inference from the container header, column
  * pruning reaching the scan, atomic overwrite, and clear rejection of
  * out-of-scope types.
  */
class AvroSourceSpec extends SparkSpec {

  private val base = "/tmp/graft_avro_spec"

  test("primitive + nullable round-trip preserves rows and inferred schema") {
    val dir = s"$base/prims"
    val df = spark
      .createDataFrame(Seq(
        (1L, "alpha", 1.5d, true),
        (2L, null.asInstanceOf[String], -0.25d, false),
        (3L, "gamma", 0.0d, true)
      ))
      .toDF("id", "name", "score", "flag")
    Sources.writeAvro(df, dir)
    val back = Sources.avro(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq("id" -> LongType, "name" -> StringType, "score" -> DoubleType, "flag" -> BooleanType))
    assert(back.collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getBoolean(3))).toSet ==
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getBoolean(3))).toSet)
  }

  test("arrays, maps, binary and nested structs round-trip") {
    val dir = s"$base/nested"
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("xs", ArrayType(IntegerType, containsNull = true)),
      StructField("tags", MapType(StringType, LongType, valueContainsNull = true)),
      StructField("blob", BinaryType),
      StructField("inner", StructType(Seq(
        StructField("a", StringType),
        StructField("b", DoubleType)
      )))
    ))
    val rows = Seq(
      Row(1L, Seq(1, 2, null), Map("x" -> 10L, "y" -> null), Array[Byte](1, 2, 3), Row("s", 2.5d)),
      Row(2L, Seq.empty[Any], Map.empty[String, Any], Array.emptyByteArray, Row(null, 0.0d))
    )
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    Sources.writeAvro(df, dir)
    val back = Sources.avro(spark, dir)
    assert(back.count() == 2)
    val r1 = back.filter(col("id") === 1L).head()
    assert(r1.getSeq[Any](1) == Seq(1, 2, null))
    assert(r1.getMap[String, Any](2) == Map("x" -> 10L, "y" -> null))
    assert(r1.getAs[Array[Byte]](3).toSeq == Seq[Byte](1, 2, 3))
    assert(r1.getStruct(4).getString(0) == "s" && r1.getStruct(4).getDouble(1) == 2.5d)
    val r2 = back.filter(col("id") === 2L).head()
    assert(r2.getSeq[Any](1).isEmpty && r2.getMap[String, Any](2).isEmpty)
    assert(r2.getStruct(4).isNullAt(0))
  }

  test("column pruning reaches the scan; computed result matches full read") {
    val dir = s"$base/prune"
    Sources.writeAvro(
      Tables.documents(spark, sfDir).select("doc_id", "source", "text"),
      dir
    )
    val pruned = Sources.avro(spark, dir).select("doc_id")
    assert(pruned.queryExecution.executedPlan.toString.contains("ReadSchema: struct<doc_id:bigint>"))
    assert(pruned.count() == Tables.documents(spark, sfDir).count())
    // full fidelity through the roundtrip
    val back = Sources.avro(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == orig)
  }

  test("limit pushdown reaches the scan; global limit stays correct") {
    val dir = s"$base/limit"
    Sources.writeAvro(Tables.documents(spark, sfDir).select("doc_id", "text"), dir)
    val df = Sources.avro(spark, dir).limit(3)
    assert(df.queryExecution.executedPlan.toString.contains("PushedLimit: 3"))
    assert(df.count() == 3)
  }

  test("overwrite replaces atomically, append coexists, no temp litter") {
    val dir = s"$base/write"
    val df1 = spark.createDataFrame(Seq((1L, "a"), (2L, "b"))).toDF("id", "v")
    df1.write.format("graft-avro").mode("overwrite").save(dir)
    val df2 = spark.createDataFrame(Seq((3L, "c"))).toDF("id", "v")
    df2.write.format("graft-avro").mode("overwrite").save(dir)
    assert(Sources.avro(spark, dir).collect().map(_.getLong(0)).toSet == Set(3L))
    df1.write.format("graft-avro").mode("append").save(dir)
    assert(Sources.avro(spark, dir).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(Files.list(Paths.get(dir)).filter(p => p.getFileName.toString.startsWith("_tmp_")).count() == 0)
  }

  test("unsupported types are rejected with a clear error, not silently mangled") {
    val dir = s"$base/reject"
    val df  = spark.range(1).select(current_timestamp().as("ts"))
    val ex  = intercept[Exception](df.write.format("graft-avro").mode("overwrite").save(dir))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("graft-avro")), s"unexpected failure: $ex")
  }
}
