package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-schema drift gate for the driver-provided corpus.
  *
  * The r7 testdata regeneration changed events.ts from parquet INT64
  * TIMESTAMP(NANOS) to timestamp[us] (TIMESTAMP_NTZ) and nothing failed
  * loudly: batch queries errored at plan time, but the STREAMING path
  * silently reinterpreted µs as ns and produced wrong aggregates. This
  * spec makes the next regeneration a one-line test failure instead:
  * every table's footer schema is checked against `Schemas.*` (exact
  * match, or the documented adaptable set for events.ts), and the
  * streaming guard's negative path is pinned — a wrong declared type
  * must throw, never misread.
  */
class SchemaDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def physical(table: String): StructType =
    spark.read.parquet(s"$dir/$table.parquet").schema

  // The set Tables.normalizeEventTs can adapt; anything else must fail.
  private val adaptableTs: Set[DataType] =
    Set(TimestampNTZType, LongType, TimestampType)

  test("events footer matches Schemas.events; ts within the adaptable set") {
    val phys = physical("events")
    assert(phys.fieldNames.toSeq === Schemas.events.fieldNames.toSeq)
    assert(adaptableTs.contains(phys("ts").dataType),
      s"events.ts drifted to ${phys("ts").dataType} — extend Tables.normalizeEventTs")
    // The streaming declaration must EQUAL the footer (no adaptive read
    // there — declared-schema sources reinterpret raw values on mismatch).
    assert(phys("ts").dataType === Schemas.events("ts").dataType,
      "Schemas.events.ts no longer matches the physical file; streaming " +
        "reads would silently misread — update the declaration")
    phys.fields.filter(_.name != "ts").foreach { f =>
      assert(f.dataType === Schemas.events(f.name).dataType,
        s"events.${f.name} drifted to ${f.dataType}")
    }
  }

  test("documents and embeddings footers match their declared schemas") {
    for ((table, declared) <- Seq("documents" -> Schemas.documents,
                                  "embeddings" -> Schemas.embeddings)) {
      val phys = physical(table)
      assert(phys.fieldNames.toSeq === declared.fieldNames.toSeq, table)
      phys.fields.foreach { f =>
        // Array element nullability is writer-dependent; compare the SQL
        // type rendering, which erases nullability.
        assert(f.dataType.sql === declared(f.name).dataType.sql,
          s"$table.${f.name} drifted to ${f.dataType}")
      }
    }
  }

  test("TPC-H star-schema footers match the pinned Schemas.star") {
    for ((table, declared) <- Schemas.star) {
      val phys = physical(table)
      assert(phys.fieldNames.toSeq === declared.fieldNames.toSeq, table)
      phys.fields.foreach { f =>
        assert(f.dataType.sql === declared(f.name).dataType.sql,
          s"$table.${f.name} drifted to ${f.dataType}")
      }
    }
  }

  test("normalizeEventTs: adaptable types normalize, anything else throws") {
    assert(Tables.normalizeEventTs(TimestampNTZType) ne null)
    assert(Tables.normalizeEventTs(LongType) ne null)
    assert(Tables.normalizeEventTs(TimestampType) ne null)
    val e = intercept[IllegalStateException] {
      Tables.normalizeEventTs(StringType)
    }
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("batch events read yields µs-grain TimestampType identical to raw NTZ") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    // Parity with the raw file under the UTC session: epoch-µs must match.
    val raw = spark.read.parquet(s"$dir/events.parquet")
      .select(unix_micros(col("ts").cast(TimestampType)).as("us"))
    val viaTables = ev.select(unix_micros(col("ts")).as("us"))
    assert(raw.agg(sum("us"), count("*")).collect().toSeq ===
      viaTables.agg(sum("us"), count("*")).collect().toSeq)
  }

  test("streaming guard: declared/physical mismatch trips, match passes") {
    val staged = java.nio.file.Files
      .createTempDirectory("graft-drift-test").toString
    spark.range(3).select(
        col("id").as("event_id"),
        timestamp_millis(col("id") * 1000).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(staged)
    // Correct declaration passes.
    streaming.Streaming.assertDeclaredTsType(spark, staged, TimestampNTZType)
    // The r7 failure mode — LongType declared over an NTZ file — must
    // throw loudly instead of silently misreading µs as ns.
    val e = intercept[IllegalArgumentException] {
      streaming.Streaming.assertDeclaredTsType(spark, staged, LongType)
    }
    assert(e.getMessage.contains("physical type"))
  }
}
