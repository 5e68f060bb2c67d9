package graft

import graft.operators.TextOps
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Format-agnostic table loading (`Tables.tableAs`): the same library
  * queries produce identical results over ORC-, CSV-, JSON- and
  * Avro-landed copies of a table, ORC keeps columnar pushdown/pruning,
  * and the row formats are gated on an explicit schema (no inference
  * scans). Avro works by CLASS NAME (`Tables.AvroFormat`): this build
  * ships the format inside spark-sql but without the short-name
  * service registration, so `format("avro")` errors while the
  * class-name form round-trips. */
class SourceFormatsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("ORC round-trip: token stats over the ORC copy equal the " +
    "parquet truth, and a filter reaches the ORC scan as a pushed " +
    "predicate with a pruned read schema") {
    val dir = Files.createTempDirectory("fmt-orc").toString + "/documents"
    docs.write.orc(dir)
    val orc = Tables.tableAs(spark, dir, "orc")
    assert(orc.schema == docs.schema, "ORC did not preserve the schema")
    val truth = TextOps.tokenStats(spark, sf()).collect().toSeq
    // same operator body over the ORC relation (tokenStats reads via
    // Tables; rebuild its expression stack on the ORC frame)
    val viaOrc = orc
      .withColumn("toks", TextOps.tokens)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_chars_clean",
        length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
      .withColumn("avg_token_len",
        col("n_chars_clean").cast("double") / col("n_tokens"))
      .withColumn("n_subwords",
        regexp_count(col("text"), lit(TextOps.SubwordRegex)).cast("long"))
      .withColumn("bpe_fertility",
        col("n_subwords").cast("double") / col("n_tokens"))
      .select("doc_id", "lang", "n_tokens", "n_chars_clean", "n_distinct",
        "ttr", "avg_token_len", "n_subwords", "bpe_fertility")
      .orderBy("doc_id").collect().toSeq
    assert(viaOrc == truth, "ORC-landed corpus diverged from parquet")
    // pushdown + pruning reach the ORC scan like the parquet pins
    val p = orc.filter(col("n_chars") > 100).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      s"ORC scan lost the pushed predicate:\n$p")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("text"), s"ORC scan reads unprojected columns: $read")
  }

  test("CSV and JSON round-trips under an explicit schema reproduce " +
    "the orders table exactly; schemaless row-format reads are refused") {
    val base = Files.createTempDirectory("fmt-row").toString
    val orders = Tables.orders(spark, sf())
    orders.write.option("header", "true").csv(s"$base/csv")
    orders.write.json(s"$base/json")
    val truth = orders.orderBy("o_orderkey").collect().toSeq
    for (fmt <- Seq("csv", "json")) {
      val opts = if (fmt == "csv") Map("header" -> "true")
                 else Map.empty[String, String]
      val got = Tables.tableAs(spark, s"$base/$fmt", fmt,
          Some(orders.schema), opts)
        .orderBy("o_orderkey").collect().toSeq
      assert(got == truth, s"$fmt round-trip diverged")
    }
    // row formats without a schema are an error, not an inference scan
    // — even for a path already memoized under a schema'd read (the
    // memo key carries the schema, so the stale relation can't serve)
    val e = intercept[IllegalArgumentException] {
      Tables.tableAs(spark, s"$base/csv", "csv",
        options = Map("header" -> "true"))
    }
    assert(e.getMessage.contains("explicit schema"))
    // and an EVOLVED schema for the same path/options reads fresh
    val wide = Tables.tableAs(spark, s"$base/json", "json",
      Some(orders.schema.add("extra_col",
        org.apache.spark.sql.types.StringType)))
    assert(wide.schema.fieldNames.contains("extra_col"),
      "memo served the stale pre-evolution relation")
  }

  test("Avro round-trip: Spark 4 ships avro inside spark-sql — the " +
    "documents table survives write/read exactly under its own schema") {
    // Avro is self-describing like parquet/orc but row-oriented, so
    // tableAs still gates it on an explicit schema (the avro reader
    // infers from file metadata — cheap — but an explicit schema keeps
    // the read deterministic under schema evolution)
    // the short name "avro" is not service-registered in this build's
    // jars, but the format class itself ships in spark-sql — address
    // it by class name (Tables.AvroFormat)
    val dir = Files.createTempDirectory("fmt-avro").toString + "/documents"
    docs.write.format(Tables.AvroFormat).save(dir)
    val truth = docs.orderBy("doc_id").collect().toSeq
    val viaAvro = Tables.tableAs(spark, dir, Tables.AvroFormat,
        Some(docs.schema))
      .orderBy("doc_id").collect().toSeq
    assert(viaAvro == truth, "Avro round-trip diverged")
  }
}
