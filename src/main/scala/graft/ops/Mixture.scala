package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mixture shaping: the source/language rebalancing layer a
  * pre-training pipeline runs between dedup and tokenization (builder
  * brief "operations a large-scale training-data pipeline would need").
  * Three ops over `documents`:
  *
  *   - [[sourceCaps]]      — per-source quota capping (the C4/RefinedWeb
  *                           "at most K pages per domain" rule)
  *   - [[temperatureSample]] — multinomial temperature rebalancing of the
  *                           language mixture (the XLM-R/mT5 alpha-sampling
  *                           step), the soft variant of TextDedup's hard
  *                           [[TextDedup.stratifiedSample]] flattening
  *   - [[sourceSimilarity]] — pairwise source-overlap estimation from
  *                           bottom-k shingle sketches (which sources are
  *                           mirrors of each other BEFORE paying for a
  *                           cross-source dedup pass)
  *
  * Everything is deterministic (content-hash gates, hash-ordered ranks),
  * so results are reproducible run-to-run and every op hash-matches its
  * DuckDB oracle.
  */
object Mixture extends QueryModule {

  // --- per-source quota caps ----------------------------------------------

  /** Keep at most `capK` documents per source, selected by content-hash
    * rank (a reproducible uniform sample of the source, vs "first K by
    * id" which would bias toward old pages). Emits every document with
    * its in-source rank and the keep decision, so downstream stages can
    * filter on `kept` while audits see what was dropped.
    *
    * Scale shape: one hash-partitioned window per source — sources
    * parallelize across executors. A pathological mega-domain collapses
    * its partition to one task; the standard mitigation (pre-cap each
    * map partition to its local top-K before the shuffle, valid because
    * the global top-K per key is a subset of the per-partition top-Ks)
    * applies but only pays off when one domain exceeds an executor, so
    * the direct window is the registered form. */
  private[ops] val capK = 15

  def sourceCaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    Core.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        graft.functions.poly_hash(col("text")).as("h"))
      .withColumn("src_rank", row_number().over(w))
      .select(col("doc_id"), col("source"), col("src_rank"),
        when(col("src_rank") <= capK, 1).otherwise(0).as("kept"))
  }

  val sourceCapsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, ${TextDedup.charHashSql("text")} AS h FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS src_rank
       |  FROM d)
       |SELECT doc_id, source, CAST(src_rank AS INTEGER) AS src_rank,
       |  CAST(CASE WHEN src_rank <= $capK THEN 1 ELSE 0 END AS INTEGER) AS kept
       |FROM r""".stripMargin

  // --- temperature-based language rebalancing ------------------------------

  /** Multinomial temperature sampling over the language mixture: keep
    * rate r_l = (n_min / n_l)^alpha with alpha = 0.5, so the mixture is
    * flattened TOWARD uniform without collapsing to the smallest
    * language (r = 1 for the smallest; a 9x-larger language keeps 1/3
    * of its docs instead of stratifiedSample's 1/9). alpha = 0.5 is
    * chosen over XLM-R's 0.3 deliberately: it makes the rate a sqrt of
    * an exact ratio — sqrt and division are IEEE-correctly-rounded in
    * both engines, so the keep gate is bit-identical, whereas pow(x,0.3)
    * carries no cross-engine rounding guarantee.
    *
    * The gate itself is the same content-hash threshold as
    * [[TextDedup.stratifiedSample]] (membership decidable per-row, no
    * global state); the plan is one scan + a tiny per-language count
    * broadcast back — nothing shuffles at corpus scale. */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Core.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (graft.functions.poly_hash(col("text")) % lit(1000000L)).as("h"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val minc = counts.agg(min(col("n_lang")).as("n_min"))
    docs.join(broadcast(counts), "lang").crossJoin(broadcast(minc))
      .withColumn("keep_rate",
        sqrt(col("n_min").cast("double") / col("n_lang").cast("double")))
      .groupBy(col("lang"), col("n_lang"), col("keep_rate"))
      .agg(sum(when(col("h").cast("double") < col("keep_rate") * lit(1000000.0), 1L)
        .otherwise(0L)).as("n_kept"))
      .select(col("lang"), col("n_lang"), col("keep_rate"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_lang").cast("double")).as("kept_fraction"))
  }

  val temperatureSampleSql: String =
    s"""WITH docs AS (
       |  SELECT doc_id, lang, ${TextDedup.charHashSql("text")} % 1000000 AS h FROM documents),
       |counts AS (SELECT lang, count(*) AS n_lang FROM docs GROUP BY 1),
       |m AS (SELECT min(n_lang) AS n_min FROM counts)
       |SELECT lang, n_lang,
       |  sqrt(CAST(n_min AS DOUBLE) / CAST(n_lang AS DOUBLE)) AS keep_rate,
       |  CAST(sum(CASE WHEN CAST(h AS DOUBLE) <
       |    sqrt(CAST(n_min AS DOUBLE) / CAST(n_lang AS DOUBLE)) * 1000000.0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN CAST(h AS DOUBLE) <
       |    sqrt(CAST(n_min AS DOUBLE) / CAST(n_lang AS DOUBLE)) * 1000000.0
       |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(n_lang AS DOUBLE) AS kept_fraction
       |FROM docs JOIN counts USING (lang) CROSS JOIN m
       |GROUP BY lang, n_lang, keep_rate""".stripMargin

  // --- pairwise source similarity from bottom-k sketches --------------------

  /** Which sources substantially overlap (mirror sites, re-crawls,
    * shared templates)? Estimated WITHOUT a cross-source document join:
    * each source is summarized by its bottom-k sketch (the `skK`
    * smallest distinct shingle hashes — a fixed-size uniform sample of
    * the source's shingle set), and for each source pair the standard
    * bottom-k union estimator runs over sketches alone:
    * J(A,B) ~ |{h in bottom-k(skA u skB) : h in skA and h in skB}| / k.
    *
    * Scale shape: the only corpus-sized work is the per-source distinct
    * shingle hash (one shuffle) + a bottom-k window over distinct hashes;
    * the sketch table is skK rows per source regardless of corpus size,
    * so the pairwise stage — broadcast equi-joins of the pair list
    * against the sketch table, never a doc-level join — is O(sources^2
    * * k) and independent of the 100 TB. The estimator is unbiased with
    * s.e. ~ 1/sqrt(k) ~ 0.125 at k=64 (documented; MixtureSpec asserts
    * the planted-overlap ordering survives it). */
  private[ops] val skK = 64

  def sourceSimilarity(spark: SparkSession, dir: String): DataFrame =
    sourceSimilarityFrom(Core.documents(spark, dir))

  /** The sketch + estimator core over any (source, text) frame — shared
    * with MixtureSpec's planted-mirror and half-overlap assertions. */
  def sourceSimilarityFrom(docs: DataFrame): DataFrame = {
    val dn = TextDedup.withNgramArr(docs)
      .select(col("source"), explode(array_distinct(col("ngarr"))).as("ng"))
      .select(col("source"), graft.functions.poly_hash(col("ng")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("source")).orderBy(col("h"))
    val sk = dn.withColumn("r", row_number().over(w)).filter(col("r") <= skK)
      .select(col("source"), col("h"))
    val srcs = sk.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .join(srcs.select(col("source").as("src_b")), col("src_a") < col("src_b"))
    val ua = pairs.join(broadcast(sk).withColumnRenamed("source", "src_a"), "src_a")
      .select(col("src_a"), col("src_b"), col("h"), lit(1).as("in_a"), lit(0).as("in_b"))
    val ub = pairs.join(broadcast(sk).withColumnRenamed("source", "src_b"), "src_b")
      .select(col("src_a"), col("src_b"), col("h"), lit(0).as("in_a"), lit(1).as("in_b"))
    val u = ua.unionByName(ub)
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val wp = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))
    u.withColumn("r", row_number().over(wp)).filter(col("r") <= skK)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("k_union"),
        sum((col("in_a") * col("in_b")).cast("long")).as("n_both"))
      .select(col("src_a"), col("src_b"), col("k_union"), col("n_both"),
        (col("n_both").cast("double") / col("k_union").cast("double")).as("jaccard_est"))
  }

  val sourceSimilaritySql: String = {
    val ngHash = TextDedup.charHashSql("ng")
    s"""WITH dn AS (
       |  SELECT DISTINCT source, $ngHash AS h FROM (
       |    SELECT source, unnest(list_distinct(${TextDedup.ngramsSql})) AS ng FROM documents)),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r FROM dn)
       |  WHERE r <= $skK),
       |srcs AS (SELECT DISTINCT source FROM sk),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |u AS (
       |  SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
       |    SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
       |    FROM pairs p JOIN sk s ON s.source = p.src_a
       |    UNION ALL
       |    SELECT p.src_a, p.src_b, s.h, 0 AS in_a, 1 AS in_b
       |    FROM pairs p JOIN sk s ON s.source = p.src_b)
       |  GROUP BY 1, 2, 3),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS r FROM u)
       |SELECT src_a, src_b,
       |  CAST(count(*) AS BIGINT) AS k_union,
       |  CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
       |  CAST(sum(in_a * in_b) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS jaccard_est
       |FROM rk WHERE r <= $skK
       |GROUP BY 1, 2""".stripMargin
  }

  override def queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "source_caps" -> (sourceCaps _),
    "temperature_sample" -> (temperatureSample _),
    "source_similarity" -> (sourceSimilarity _))

  override def oracle: Seq[(String, String)] = Seq(
    "source_caps" -> sourceCapsSql,
    "temperature_sample" -> temperatureSampleSql,
    "source_similarity" -> sourceSimilaritySql)
}
