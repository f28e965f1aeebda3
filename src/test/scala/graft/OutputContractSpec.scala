package graft

import org.apache.spark.sql.types._

/** Structural guard for the driver-harness output contract (SURVEY
  * Appendix B, extended after round 1): the harness compares frames via
  * pandas, where DECIMAL representations diverge (Spark parquet → Decimal
  * objects, DuckDB .df() → float64) and ARRAY/MAP/STRUCT columns crash
  * sort_values. So NO returned frame — q_* or cap_* — may contain any of
  * those types. Internal arithmetic stays exact DECIMAL; only the final
  * select converts (Dsl.d2d / d2dSql).
  *
  * Schema-only: .schema triggers analysis, not execution, so this covers
  * every registry entry cheaply — except the few caps whose construction
  * performs a write; those run at sf0.001.
  */
class OutputContractSpec extends SparkSuite {

  private def offending(dt: DataType): Boolean = dt match {
    case _: DecimalType | _: ArrayType | _: MapType | _: StructType => true
    // DATE diverges too: Spark parquet → datetime.date objects, DuckDB
    // .df() → datetime64. Emit midnight TIMESTAMPs instead.
    case DateType => true
    case _ => false
  }

  test("no q_*/cap_* output schema contains DECIMAL, DATE, ARRAY, MAP, or STRUCT") {
    val d = sf("0.001")
    val bad = SparkEntry.registry.flatMap { q =>
      val schema = q.fn(spark, d).schema
      schema.fields.collect {
        case f if offending(f.dataType) => s"${q.name}.${f.name}: ${f.dataType.sql}"
      }
    }
    assert(bad.isEmpty, s"harness-breaking output columns:\n  ${bad.mkString("\n  ")}")
  }

  test("driver smoke contract: entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique (no silent shadowing through toMap)") {
    // SparkEntry.queries is registry.toMap — a duplicate name would make
    // the later registration silently WIN and the earlier one untested
    // (round-11 nearly shipped exactly that with cap_scan_metadata)
    val dups = SparkEntry.registry.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate registry names: ${dups.mkString(", ")}")
  }
}
