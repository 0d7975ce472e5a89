package graft.ops

import java.nio.file.Files

/** Pins the ProbeTemp memoization contract (ops/Core.scala): one build
  * per (kind, source-dir CONTENT) per JVM — same content is served the
  * cached artifact, an in-place rewrite of the source dir triggers a
  * rebuild instead of serving stale data (VERDICT r12 #4: the previous
  * key was the directory STRING under a documented immutable-per-JVM
  * assumption; fine for the harness, a stale-index hazard for a
  * long-lived engine). */
class ProbeTempSpec extends graft.SparkSpec {

  test("same content is memoized; an in-place rewrite rebuilds") {
    val src = Files.createTempDirectory("pt_src")
    Files.writeString(src.resolve("data.txt"), "v1")
    var builds = 0
    def build(): String = ProbeTemp.dir("spec_fp", src.toString) { _ => builds += 1 }
    val d1 = build()
    val d1b = build()
    assert(d1 == d1b && builds == 1,
      s"unchanged source must be served the cached artifact (builds=$builds)")
    // rewrite in place; content length changes so the fingerprint
    // moves even under coarse mtime resolution
    Files.writeString(src.resolve("data.txt"), "v2-rewritten")
    val d2 = build()
    assert(d2 != d1 && builds == 2,
      s"an in-place rewrite must rebuild into a fresh dir (builds=$builds)")
    // the rewritten content is itself memoized
    assert(build() == d2 && builds == 2)
    // r14 (ADVICE r13): the superseded artifact dir is evicted from
    // disk once its replacement has built — rewrites no longer leak
    // old artifacts until JVM exit
    assert(!Files.exists(java.nio.file.Paths.get(d1)),
      s"superseded artifact $d1 must be deleted after the rebuild")
    assert(Files.exists(java.nio.file.Paths.get(d2)), "live artifact must survive eviction")
  }

  test("a rewritten corpus is never served a stale cluster sidecar (end-to-end)") {
    // dedupClusters serves its ProbeTemp parquet artifact; overwrite
    // the corpus dir in place and the next construction must reflect
    // the NEW corpus, not the cached clusters of the old one.
    val sf0001 = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("pt_corpus").toString
    val docs = Core.documents(spark, sf0001)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val full = TextDedup.dedupClusters(spark, dir).count()
    assert(full > 0, "fixture corpus must produce clusters")
    // overwrite with a single document: no pairs, no clusters
    docs.limit(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val one = TextDedup.dedupClusters(spark, dir).count()
    assert(one == 0L,
      s"rewritten corpus must rebuild the sidecar (got $one rows — stale artifact?)")
  }
}
