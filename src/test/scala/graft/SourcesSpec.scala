package graft

import org.apache.spark.sql.functions._
import graft.sources.CorpusSources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def writeLines(name: String, lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_src")
    val f = dir.resolve(name)
    java.nio.file.Files.write(f, String.join("\n", lines: _*).getBytes("UTF-8"))
    f.toString
  }

  test("jsonl roundtrip: parquet documents -> jsonl -> same rows under the pinned schema") {
    val docs = graft.ops.Core.documents(spark, sf0001)
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/docs"
    docs.write.json(out)
    val (clean, bad) = CorpusSources.splitCorrupt(CorpusSources.readJsonl(spark, out))
    assert(bad.isEmpty, "a clean export must quarantine nothing")
    assert(clean.count() == docs.count())
    // column-sorted anti-join in both directions == exact row equality
    val reread = clean.select(docs.columns.map(col): _*)
    assert(reread.exceptAll(docs).isEmpty && docs.exceptAll(reread).isEmpty)
  }

  test("malformed jsonl lines land whole in quarantine, valid lines decode") {
    val path = writeLines("drop.jsonl", Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0", "n_chars": 10}""",
      """{"doc_id": 2, "text": "gamma", "lang": "de"""", // truncated record
      """not json at all""",
      """{"doc_id": 3, "text": "delta", "lang": "fr", "source": "s1", "n_chars": 5}"""))
    val (clean, bad) = CorpusSources.splitCorrupt(CorpusSources.readJsonl(spark, path))
    assert(clean.count() == 2)
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    val quarantined = bad.as[String].collect()
    assert(quarantined.length == 2)
    assert(quarantined.exists(_.contains("not json at all")),
      "the raw malformed line must be preserved for replay")
  }

  test("streaming jsonl ingest: files become micro-batches, corrupt lines survive the split") {
    val dropDir = java.nio.file.Files.createTempDirectory("graft_drops")
    def drop(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dropDir.resolve(name),
        String.join("\n", lines: _*).getBytes("UTF-8"))
    drop("d0.jsonl", Seq(
      """{"doc_id": 1, "text": "alpha", "lang": "en", "source": "s0", "n_chars": 5}""",
      """broken line"""))
    val stream = CorpusSources.streamJsonl(spark, dropDir.toString)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("src_ingest")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // a second drop arrives: the file source picks it up incrementally
      drop("d1.jsonl", Seq(
        """{"doc_id": 2, "text": "beta", "lang": "de", "source": "s1", "n_chars": 4}"""))
      q.processAllAvailable()
      val (clean, bad) = CorpusSources.splitCorrupt(spark.table("src_ingest"))
      assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
      assert(bad.as[String].collect().toSeq == Seq("broken line"))
    } finally q.stop()
  }

  test("curate drops end-to-end: corpus lands curated+deduped, quarantine keeps raw lines") {
    val dropDir = java.nio.file.Files.createTempDirectory("graft_curate_in")
    val outDir = java.nio.file.Files.createTempDirectory("graft_curate_out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_curate_ck").toString
    // good docs need quality_score >= 0.55: mid-length unique-ish text
    val goodText = (1 to 30).map(i => s"tok$i").mkString(" ") // ~180 chars, all unique
    val junkText = Seq.fill(40)("a").mkString(" ")            // stopword soup
    def js(id: Int, text: String) =
      s"""{"doc_id": $id, "text": "$text", "lang": "en", "source": "s0", "n_chars": ${text.length}}"""
    java.nio.file.Files.write(dropDir.resolve("d0.jsonl"),
      String.join("\n",
        js(1, goodText),
        js(2, goodText), // exact duplicate of 1 (by text) -> deduped in-batch
        js(3, junkText), // fails the quality gate
        """half a record""",
        // parses CLEAN but text is null: the silent-vanish row (ADVICE
        // r4) — must land in quarantine, not disappear between sinks
        """{"doc_id": 4}"""
      ).getBytes("UTF-8"))
    val q = CorpusSources.curateDrops(spark, dropDir.toString, outDir, ck)
    try q.processAllAvailable() finally q.stop()
    val corpus = spark.read.parquet(s"$outDir/corpus")
    assert(corpus.count() == 1, "dup, junk and null-text must not land")
    // dropDuplicates keeps ONE arbitrary row per digest — either dup id
    assert(Set(1L, 2L).contains(corpus.select("doc_id").as[Long].collect().head))
    assert(corpus.columns.contains("quality_score") && corpus.columns.contains("batch_id"))
    val quarantine = spark.read.parquet(s"$outDir/quarantine")
    assert(quarantine.select("raw_line").as[String].collect().toSet ==
      Set("half a record", """{"doc_id": 4}"""),
      "malformed AND unscoreable lines both quarantine")
  }

  test("streaming csv drops curate end-to-end: per-file headers dropped, corrupt rows quarantine") {
    val dropDir = java.nio.file.Files.createTempDirectory("graft_csv_in")
    val outDir = java.nio.file.Files.createTempDirectory("graft_csv_out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_csv_ck").toString
    val header = "doc_id,text,lang,source,n_chars"
    val goodText = (1 to 30).map(i => s"tok$i").mkString(" ")
    def drop(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(dropDir.resolve(name),
        String.join("\n", lines: _*).getBytes("UTF-8"))
    drop("d0.csv", Seq(header,
      s"1,$goodText,en,s0,${goodText.length}",
      "oops,not a number here either way,de,s1,xx")) // corrupt: bad doc_id + n_chars
    val q = CorpusSources.curateDrops(spark, dropDir.toString, outDir, ck, format = "csv")
    try {
      q.processAllAvailable()
      // a second drop arrives WITH ITS OWN HEADER: incremental pickup,
      // header must not decode (or quarantine) a second time
      drop("d1.csv", Seq(header, s"2,$goodText extra,en,s0,${goodText.length + 6}"))
      q.processAllAvailable()
    } finally q.stop()
    val corpus = spark.read.parquet(s"$outDir/corpus")
    assert(corpus.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(corpus.schema("doc_id").dataType == org.apache.spark.sql.types.LongType,
      "streamed csv must decode under the pinned schema, not as strings")
    val quarantine = spark.read.parquet(s"$outDir/quarantine")
    val qLines = quarantine.select("raw_line").as[String].collect()
    assert(qLines.length == 1 && qLines.head.startsWith("oops,"),
      s"exactly the corrupt row quarantines, got ${qLines.mkString("; ")}")
  }

  test("csv with a corrupt row: typed columns survive, bad row quarantines") {
    val path = writeLines("drop.csv", Seq(
      "doc_id,text,lang,source,n_chars",
      "1,alpha beta,en,s0,10",
      "oops,this row has,a,non-numeric,id",
      "3,delta,fr,s1,5"))
    val (clean, bad) = CorpusSources.splitCorrupt(CorpusSources.readCsv(spark, path))
    assert(clean.count() == 2 && bad.count() == 1)
    assert(clean.schema("doc_id").dataType == org.apache.spark.sql.types.LongType)
  }
}
