package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** SURVEY §7.6 rule 4b, enforced inside `sbt test` (the python
  * precheck enforces the same rule at the differential gate): an
  * ORACLED key must not emit any nested-typed output column — the
  * driver's comparer sorts result frames with pandas and throws
  * `unhashable type: numpy.ndarray` on nested cells, which was round
  * 9's only red row (`q_embed_whiten`, a raw `array<double>` column).
  * Vectors must be serialized (int-quantized `array_join` strings,
  * the `whitened_q` precedent) or emitted as long-form rows.
  *
  * Non-oracled keys (the contract omits) are allowed nested columns:
  * the driver records a rows-only check for them and never sorts
  * their frames.
  */
class OutputShapeSpec extends SparkSpec {

  private def nested(fields: StructType): Seq[String] =
    fields.flatMap { f =>
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => Some(f.name)
        case _ => None
      }
    }

  SparkEntry.oracleSql.keys.toSeq.sorted.foreach { name =>
    test(s"$name: no nested-typed output column (driver comparer rule)") {
      val bad = nested(SparkEntry.queries(name)(spark, sfDir).schema)
      assert(bad.isEmpty,
        s"oracled key $name emits nested column(s) ${bad.mkString(", ")} — " +
          "serialize to string (SURVEY §7.6 rule 4b) or emit long-form rows")
    }
  }
}
