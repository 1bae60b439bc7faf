package graft

import graft.sources.Jsonl
import java.nio.file.Files

/** JSONL source/sink: round-trip fidelity and scan-stage quarantine of
  * corrupt lines (the 100 TB ingest must classify, not crash).
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("round trip: write then read returns the original documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter($"doc_id" < 50)
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/docs"
    Jsonl.write(docs, dir)
    val back = Jsonl.read(spark, dir, Jsonl.documentsSchema)
    assert(back.schema == docs.schema)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = back.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("quarantine: corrupt / wrong-typed / blank lines split from parsed rows") {
    val f = Files.createTempDirectory("graft-jsonl-q").resolve("in.jsonl")
    Files.writeString(f, Seq(
      """{"doc_id": 1, "text": "good one", "lang": "en", "source": "s", "n_chars": 8}""",
      """not json at all {""",
      "", // blank — ignored entirely, neither parsed nor quarantined
      """{"doc_id": "NaN?", "text": "id is a string", "lang": "en", "source": "s", "n_chars": 1}""",
      """{"doc_id": 2, "text": "also good", "lang": "de", "source": "s", "n_chars": 9}"""
    ).mkString("\n"))
    val (good, bad) = Jsonl.readWithQuarantine(spark, f.toString,
      Jsonl.documentsSchema, requiredCol = Some("doc_id"))
    assert(good.orderBy("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val quarantined = bad.collect().map(_.getString(0)).toSeq
    assert(quarantined.length == 2)
    assert(quarantined.exists(_.startsWith("not json")))
    assert(quarantined.exists(_.contains("NaN?")))
  }
}
