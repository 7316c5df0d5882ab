package graft

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.AvroConv

/** Property: for every value of the supported type subset,
  * toCatalyst(toAvro(v)) == v under the matching Avro schema — the
  * conversion layer is lossless independent of any Spark job. Runs
  * no session: pure value-level round-trips (the container-file and
  * commit-protocol halves are covered by AvroSourceSpec).
  */
class AvroConvPropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val fieldType: Gen[DataType] = Gen.oneOf(
    BooleanType, IntegerType, LongType, FloatType, DoubleType, StringType, BinaryType,
    ArrayType(LongType, containsNull = true),
    ArrayType(StringType, containsNull = true),
    MapType(StringType, DoubleType, valueContainsNull = true),
    StructType(Seq(StructField("a", StringType), StructField("b", LongType)))
  )

  private def valueFor(dt: DataType): Gen[Any] = dt match {
    case BooleanType => Arbitrary.arbBool.arbitrary.map(b => b: Any)
    case IntegerType => Arbitrary.arbInt.arbitrary.map(v => v: Any)
    case LongType    => Arbitrary.arbLong.arbitrary.map(v => v: Any)
    case FloatType   => Arbitrary.arbFloat.arbitrary.map(v => v: Any)
    case DoubleType  => Arbitrary.arbDouble.arbitrary.map(v => v: Any)
    case StringType  => Gen.asciiPrintableStr.map(s => UTF8String.fromString(s): Any)
    case BinaryType  => Gen.listOf(Arbitrary.arbByte.arbitrary).map(_.toArray: Any)
    case ArrayType(e, _) =>
      Gen.listOfN(3, Gen.option(valueFor(e))).map(xs => new GenericArrayData(xs.map(_.orNull)): Any)
    case MapType(StringType, v, _) =>
      Gen
        .listOfN(3, Gen.zip(Gen.identifier, Gen.option(valueFor(v))))
        .map { kvs =>
          val dedup = kvs.toMap.toSeq
          new ArrayBasedMapData(
            new GenericArrayData(dedup.map { case (k, _) => UTF8String.fromString(k): Any }),
            new GenericArrayData(dedup.map { case (_, x) => x.orNull })
          ): Any
        }
    case st: StructType =>
      st.fields.toList
        .map(f => Gen.option(valueFor(f.dataType)))
        .foldRight(Gen.const(List.empty[Option[Any]])) { (g, acc) =>
          g.flatMap(v => acc.map(v :: _))
        }
        .map(vs => InternalRow.fromSeq(vs.map(_.orNull)): Any)
    case other => sys.error(s"no generator for $other")
  }

  private def eqv(a: Any, b: Any, dt: DataType): Boolean = (a, b) match {
    case (null, null)          => true
    case (null, _) | (_, null) => false
    case _ =>
      dt match {
        case BinaryType => a.asInstanceOf[Array[Byte]].sameElements(b.asInstanceOf[Array[Byte]])
        case ArrayType(e, _) =>
          val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
          x.numElements() == y.numElements() &&
          (0 until x.numElements()).forall { i =>
            eqv(
              if (x.isNullAt(i)) null else x.get(i, e),
              if (y.isNullAt(i)) null else y.get(i, e),
              e
            )
          }
        case MapType(StringType, v, _) =>
          def toMap(m: MapData): Map[String, Any] =
            (0 until m.numElements()).map { i =>
              m.keyArray().getUTF8String(i).toString ->
                (if (m.valueArray().isNullAt(i)) null else m.valueArray().get(i, v))
            }.toMap
          val x = toMap(a.asInstanceOf[MapData])
          val y = toMap(b.asInstanceOf[MapData])
          x.keySet == y.keySet && x.keySet.forall(k => eqv(x(k), y(k), v))
        case st: StructType =>
          val (x, y) = (a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
          st.fields.zipWithIndex.forall { case (f, i) =>
            eqv(
              if (x.isNullAt(i)) null else x.get(i, f.dataType),
              if (y.isNullAt(i)) null else y.get(i, f.dataType),
              f.dataType
            )
          }
        // bit-comparison for floats: NaN must round-trip as NaN and
        // compare equal to itself here (IEEE == would flake)
        case FloatType  => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float]) == 0
        case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double]) == 0
        case _          => a == b
      }
  }

  test("toCatalyst ∘ toAvro is identity over the supported subset (nullable fields)") {
    val gen: Gen[(DataType, Option[Any])] =
      fieldType.flatMap(dt => Gen.option(valueFor(dt)).map(ov => (dt, ov)))
    checkProp(Prop.forAll(gen) { case (dt, ov) =>
      val st   = StructType(Seq(StructField("f", dt, nullable = true)))
      val avro = AvroConv.toAvroSchema(st)
      val v    = ov.orNull
      val back = AvroConv.toCatalyst(AvroConv.toAvro(v, dt, avro.getField("f").schema()), dt)
      eqv(v, back, dt)
    })
  }

  test("toSqlType ∘ toAvroSchema is identity over generated struct schemas") {
    val structGen = Gen
      .listOfN(4, Gen.zip(Gen.identifier, fieldType, Arbitrary.arbBool.arbitrary))
      .map { fs =>
        val named = fs.zipWithIndex.map { case ((n, t, nul), i) => StructField(s"${n}_$i", t, nul) }
        StructType(named)
      }
    checkProp(Prop.forAll(structGen) { st =>
      AvroConv.toSqlType(AvroConv.toAvroSchema(st)) == st
    })
  }
}
