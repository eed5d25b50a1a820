package graft

import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards against testdata encoding drift (the round-10 failure mode:
  * the regenerated events.parquet silently flipped ts from
  * TIMESTAMP(NANOS) int64 to TIMESTAMP(MICROS), and the streaming
  * path's explicit LongType schema reinterpreted µs as ns — event time
  * compressed 1000× with zero errors raised anywhere).
  */
class DataContractSpec extends AnyFunSuite {
  import SparkTestSession._

  test("driver events.parquet carries a recognized ts annotation") {
    val unit = DataContract.eventsTsUnit(spark, s"$sf/events.parquet")
    assert(unit == TimeUnit.MICROS || unit == TimeUnit.NANOS)
  }

  test("a deliberately unannotated int64 ts trips the guard loudly") {
    // The exact silent-corruption shape: raw int64 epoch with NO
    // timestamp annotation — the unit is unknowable from the file, so
    // every loader (batch and streaming) must refuse rather than guess.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dc_").toString
    graft.queries.FixtureIO.writeStable(
      Seq((1L, 1700000000000000000L, 1L, "a", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      s"$tmp/stage")
    assert(new java.io.File(s"$tmp/stage/data.parquet")
      .renameTo(new java.io.File(s"$tmp/events.parquet")))
    val e = intercept[IllegalStateException] {
      DataContract.eventsTsUnit(spark, s"$tmp/events.parquet")
    }
    assert(e.getMessage.contains("data-contract drift"))
    assert(e.getMessage.contains("events.parquet"))
    // and the batch loader routes through the same guard
    intercept[IllegalStateException] { Tables.events(spark, tmp) }
  }

  test("a MICROS-annotated fixture loads through the derived-nanos path") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dc2_").toString
    val baseNs = 1700000000000000000L
    graft.queries.FixtureIO.writeStable(
      Seq((1L, baseNs, 7L, "a", 0.0, "{}"),
          (2L, baseNs + 1500L * 1000000L, 7L, "b", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")),
      s"$tmp/stage")
    assert(new java.io.File(s"$tmp/stage/data.parquet")
      .renameTo(new java.io.File(s"$tmp/events.parquet")))
    assert(DataContract.eventsTsUnit(spark, s"$tmp/events.parquet")
      == TimeUnit.MICROS)
    val rows = Tables.events(spark, tmp)
      .orderBy(col("event_id")).collect()
    assert(rows.map(_.getAs[Long]("ts")).toSeq ==
      Seq(baseNs, baseNs + 1500L * 1000000L)) // exact ns round-trip
  }

  test("driver documents.parquet long columns are plain int64") {
    DataContract.assertPlainInt64(spark, s"$sf/documents.parquet",
      Seq("doc_id", "n_chars")) // throws on drift
  }

  test("a DECIMAL-annotated int64 doc_id trips the documents guard") {
    // The documents sibling of the events µs/ns trap: decimal(18,0)
    // writes as an int64 with a DECIMAL annotation — identical raw
    // bytes here (scale 0), but a scale>0 regeneration would hand the
    // unscaled mantissa to the explicit LongType streaming schema.
    // The guard refuses ANY annotation rather than special-casing.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dc3_").toString
    graft.queries.FixtureIO.writeStable(
      Seq((1L, "text a", "en", "web", 6L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .withColumn("doc_id", expr("cast(doc_id as decimal(18,0))")),
      s"$tmp/stage")
    assert(new java.io.File(s"$tmp/stage/data.parquet")
      .renameTo(new java.io.File(s"$tmp/documents.parquet")))
    val e = intercept[IllegalStateException] {
      DataContract.assertPlainInt64(spark, s"$tmp/documents.parquet",
        Seq("doc_id", "n_chars"))
    }
    assert(e.getMessage.contains("data-contract drift"))
    assert(e.getMessage.contains("doc_id"))
  }

  test("driver embeddings.parquet satisfies the float32x64 contract") {
    DataContract.assertEmbeddingsContract(spark, s"$sf/embeddings.parquet")
  }

  test("a re-dimensioned or re-typed embeddings file trips the guard") {
    // The oracles hardcode 64 dims (range(1,65), 64-component plane
    // literals) and float32 components; the engine expressions are
    // length-generic, so a regenerated file at different dims/type
    // would mass-mismatch silently — the guard names it instead.
    import spark.implicits._
    def stage(df: org.apache.spark.sql.DataFrame, tag: String): String = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_emb_$tag").toString
      graft.queries.FixtureIO.writeStable(df, s"$tmp/stage")
      assert(new java.io.File(s"$tmp/stage/data.parquet")
        .renameTo(new java.io.File(s"$tmp/embeddings.parquet")))
      tmp
    }
    val dims32 = stage(Seq((0L, Array.fill(32)(0.5f), 1))
      .toDF("vec_id", "embedding", "label"), "d32")
    val e1 = intercept[IllegalStateException] {
      DataContract.assertEmbeddingsContract(spark, s"$dims32/embeddings.parquet")
    }
    assert(e1.getMessage.contains("data-contract drift"))
    val doubles = stage(Seq((0L, Array.fill(64)(0.5d), 1))
      .toDF("vec_id", "embedding", "label"), "dbl")
    val e2 = intercept[IllegalStateException] {
      DataContract.assertEmbeddingsContract(spark, s"$doubles/embeddings.parquet")
    }
    assert(e2.getMessage.contains("DOUBLE"))
    // and the batch loader routes through the guard
    intercept[IllegalStateException] { Tables.embeddings(spark, dims32) }
  }

  test("under-split documents scan is balanced to cluster parallelism") {
    // The testdata files are single-row-group, so the raw scan is one
    // partition; the loader must spread it so per-row signature /
    // similarity compute uses the whole cluster.
    val p = spark.sparkContext.defaultParallelism
    assert(Tables.documents(spark, sf).rdd.getNumPartitions == p)
    assert(Tables.embeddings(spark, sf).rdd.getNumPartitions == p)
  }

  test("an already-parallel input is NOT repartitioned again") {
    // The balance must be a no-op when the input already has at least
    // cluster parallelism — at corpus scale (thousands of row groups)
    // an unconditional repartition would shuffle the whole table for
    // nothing. (A directory of tiny files does NOT count as parallel:
    // Spark's open-cost packing coalesces those into few partitions,
    // and the balance correctly engages.)
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    val wide = (0L until 64L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text").repartition(p + 2)
    assert(Tables.balanced(wide).rdd.getNumPartitions == p + 2,
      "balanced must keep the existing partitioning")
    val narrow = (0L until 64L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text").coalesce(1)
    assert(Tables.balanced(narrow).rdd.getNumPartitions == p,
      "balanced must spread a single-partition input")
  }

  test("parquetRowCount matches count() with zero Spark jobs") {
    val file = s"$sf/documents.parquet"
    val fromFooter = DataContract.parquetRowCount(spark, file)
    val fromScan = spark.read.parquet(file).count()
    assert(fromFooter == fromScan && fromFooter > 0)
  }
}
