package graft

import graft.operators.FileIngest
import graft.streaming.IngestStream

class FileIngestSpec extends SparkSpec {

  test("f1 classifies converter errors and chunks extracted text") {
    val rows = FileIngest.f1FileIngest(spark, sfDir).collect()
    val enc = rows.filter(_.getString(1) == "error_encrypted")
    val emp = rows.filter(_.getString(1) == "error_empty")
    assert(enc.nonEmpty && emp.nonEmpty, "both error classes should appear")
    assert((enc ++ emp).forall(r => r.getInt(2) == -1 && r.getString(3).isEmpty))
    val ok = rows.filter(_.getString(1) == "ok")
    assert(ok.nonEmpty && ok.forall(_.getInt(2) >= 0))
    // title strategy: filename minus extension
    assert(rows.forall(r => r.getString(5) == s"file_${r.getLong(0)}"))
  }

  test("extracted file text flows into the ingestion store seam") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("filestore").toString
    val docs = FileIngest.extractText(FileIngest.fileCorpus(spark, sfDir))
      .filter(_.status == "ok")
      .map(e => (e.doc_id, "files", e.text))
      .toDF("doc_id", "source", "text")
    IngestStream.reingest(docs, store)
    val chunks = spark.read.parquet(s"$store/chunks")
    val n = chunks.count()
    assert(n > 0)
    assert(chunks.select("source").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("files"))
    // re-ingesting the same files is idempotent (the page-update path)
    IngestStream.reingest(docs, store)
    assert(spark.read.parquet(s"$store/chunks").count() == n)
  }
}
