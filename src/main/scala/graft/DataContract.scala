package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.SparkSession

/** Parquet-footer data-contract checks for the driver-provided tables.
  *
  * Why this exists: the testdata generator is free to change the
  * physical encoding of a column between rounds — `events.ts` has
  * shipped both as a TIMESTAMP(NANOS)-annotated int64 and as a
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) column. A batch read
  * surfaces such drift as a (loud) analysis error, but a streaming
  * read with an explicit LongType schema does NOT: the vectorized
  * parquet reader hands back the raw int64, silently reinterpreting
  * microseconds as nanoseconds — event time compresses 1000× with no
  * error anywhere. These footer checks run once per load (one footer
  * read, no Spark job) and turn that silent corruption into an
  * immediate failure that names the file, the annotation found, and
  * the fix.
  */
object DataContract {

  private def withFooter[T](s: SparkSession, file: String)(
      f: org.apache.parquet.hadoop.metadata.ParquetMetadata => T): T = {
    val conf = s.sessionState.newHadoopConf()
    val reader =
      ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try f(reader.getFooter)
    finally reader.close()
  }

  /** The logical-type annotation of `column` in `file`'s footer
    * (None = unannotated primitive), plus the primitive type name —
    * enough to classify every drift case with a precise message.
    */
  def columnAnnotation(s: SparkSession, file: String,
      column: String): (Option[LogicalTypeAnnotation], String) =
    withFooter(s, file) { md =>
      val schema = md.getFileMetaData.getSchema
      require(schema.containsField(column),
        s"$file: column '$column' missing from parquet schema $schema")
      val t = schema.getType(Seq(column): _*)
      (Option(t.getLogicalTypeAnnotation), t.toString)
    }

  /** Exact row count from the footer (sum of row-group counts) — a
    * zero-job alternative to `count()` for a RAW file scan (no
    * filters). Unlike catalog statistics this cannot go stale: it is
    * read from the same footer the scan itself will use.
    */
  def parquetRowCount(s: SparkSession, file: String): Long =
    withFooter(s, file)(_.getBlocks.stream.mapToLong(_.getRowCount).sum)

  /** Asserts that each named column is a PLAIN signed int64 — the only
    * parquet shape Spark's vectorized reader hands through unchanged to
    * an explicit `LongType` streaming schema. Every other int64-backed
    * shape is a silent-corruption trap under an explicit schema:
    *   - TIMESTAMP(µs/ms)-annotated → raw epoch in the wrong unit (the
    *     round-10 `events.ts` failure, 1000× event-time compression);
    *   - DECIMAL(p,s>0)-annotated   → unscaled mantissa, values off by
    *     10^s.
    * A batch read would surface these as a type change; the streaming
    * reader cannot, so the contract is pinned at the footer instead.
    * (Width changes like int32 are NOT checked: the vectorized reader
    * already fails loudly on an int32→LongType mismatch.)
    */
  def assertPlainInt64(s: SparkSession, file: String,
      columns: Seq[String]): Unit = withFooter(s, file) { md =>
    val schema = md.getFileMetaData.getSchema
    columns.foreach { c =>
      require(schema.containsField(c),
        s"$file: column '$c' missing from parquet schema $schema")
      val t = schema.getType(Seq(c): _*)
      val ok = t.isPrimitive &&
        t.asPrimitiveType.getPrimitiveTypeName ==
          org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 &&
        (Option(t.getLogicalTypeAnnotation) match {
          case None => true
          case Some(i: LogicalTypeAnnotation.IntLogicalTypeAnnotation) =>
            i.getBitWidth == 64 && i.isSigned
          case _ => false
        })
      if (!ok) throw new IllegalStateException(
        s"data-contract drift in $file: column '$c' must be a plain " +
          s"signed INT64 for the explicit LongType streaming schema, " +
          s"found '$t' (annotation=${t.getLogicalTypeAnnotation}). An " +
          "annotated int64 would be silently misread as its raw " +
          "physical value — update the streaming schema for the new " +
          "encoding instead.")
    }
  }

  /** Validates the `events.ts` contract and returns the stored unit.
    *
    * Accepted annotations (either passes — the loaders dispatch on the
    * returned unit, so a regeneration flipping between them is handled
    * correctly rather than silently misread):
    *   - TIMESTAMP(MICROS)  — current driver encoding (round 10+)
    *   - TIMESTAMP(NANOS)   — pre-round-10 encoding
    * Anything else (MILLIS, unannotated int64, non-timestamp) throws
    * with the observed footer type: an unannotated int64's unit is
    * unknowable from the file alone, and guessing is exactly the
    * silent-corruption mode this guard exists to prevent.
    */
  /** Footer-pinned embeddings contract: element primitive FLOAT and a
    * uniform dimensionality of `dims`, derived zero-job from the
    * footer (total leaf value count / total row count — exact for
    * fixed-length, null-free arrays; a ragged, null-bearing or
    * re-dimensioned regeneration breaks the arithmetic and fails
    * loudly). The DuckDB oracles hardcode 64 dims (`range(1, 65)`,
    * 64-component plane literals) while the engine expressions are
    * length-generic, so a silent dims change would mass-mismatch the
    * embedding surface exactly the way round 10's events.ts unit flip
    * did — this turns it into a named error at first load. Memoized
    * per file path (footers are immutable for a given testdata drop).
    */
  private val embeddingsOk =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def assertEmbeddingsContract(s: SparkSession, file: String,
      dims: Int = 64): Unit = {
    if (embeddingsOk.contains(file)) return
    withFooter(s, file) { md =>
      import scala.jdk.CollectionConverters._
      val leaf = "embedding.list.element"
      val desc = md.getFileMetaData.getSchema.getColumns.asScala
        .find(_.getPath.mkString(".") == leaf)
        .getOrElse(throw new IllegalStateException(
          s"embeddings data-contract drift in $file: no '$leaf' leaf in " +
            s"schema ${md.getFileMetaData.getSchema}"))
      val prim = desc.getPrimitiveType.getPrimitiveTypeName.name
      if (prim != "FLOAT") throw new IllegalStateException(
        s"embeddings data-contract drift in $file: '$leaf' is $prim, " +
          "expected FLOAT — the micro-quantization and oracle vdot " +
          "assume float32 components")
      val rows = md.getBlocks.asScala.map(_.getRowCount).sum
      val vals = md.getBlocks.asScala
        .flatMap(_.getColumns.asScala)
        .filter(_.getPath.toDotString == leaf)
        .map(_.getValueCount).sum
      if (rows <= 0 || vals != rows * dims.toLong)
        throw new IllegalStateException(
          s"embeddings data-contract drift in $file: $vals elements over " +
            s"$rows rows (expected uniform $dims dims) — the oracles " +
            s"hardcode range(1, ${dims + 1}) and $dims-component plane " +
            "literals; update PipelineOracles + Similarity.plane call " +
            "sites for the new dimensionality")
    }
    embeddingsOk.add(file)
  }

  def eventsTsUnit(s: SparkSession, file: String): TimeUnit = {
    val (ann, raw) = columnAnnotation(s, file, "ts")
    ann match {
      case Some(t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
          if t.getUnit == TimeUnit.MICROS || t.getUnit == TimeUnit.NANOS =>
        t.getUnit
      case other =>
        throw new IllegalStateException(
          s"events.ts data-contract drift in $file: expected a " +
            "TIMESTAMP(MICROS) or TIMESTAMP(NANOS) annotation, found " +
            s"'$raw' (annotation=$other). Refusing to guess the epoch " +
            "unit — update graft.Tables.events / " +
            "graft.streaming.StreamingJobs.eventsStream for the new " +
            "encoding.")
    }
  }
}
