package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Composed training-data pipelines — what a user actually runs: the
  * individual operators (quality, language-ID, exact dedup, near-dup
  * removal) chained into one corpus-cleaning job.
  *
  * Scale shape: each stage is one of the already-analyzed operators;
  * composition adds only broadcastable semi/anti joins on doc_id sets
  * (keepers, near-dup losers), so the chain costs the sum of its
  * stages, not a new shuffle structure.
  */
object Pipelines {

  /** Keep documents that (a) pass quality thresholds, (b) classify as
    * English, (c) are their exact-dup group's keeper, and (d) are not
    * the higher-id side of a near-dup pair (minhash-LSH, jac ≥ 0.5).
    */
  def cleanCorpus(docs: DataFrame): DataFrame = {
    val quality = TextAnalysis.qualityScore(docs)
      .filter(col("keep") === 1)
      .select(col("doc_id"), col("n_tokens"))
    val lang = TextAnalysis.languageId(docs)
      .filter(col("lang_pred") === "en")
      .select(col("doc_id"), col("lang_pred"))
    val keepers = Dedup.exactGroups(docs)
      .select(col("keeper").as("doc_id"))
    val nearDupLosers = Dedup.minhashLshPairs(docs, 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.select(col("doc_id"))
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .orderBy(col("doc_id"))
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "p01_clean_corpus" -> ((s, d) => cleanCorpus(Tables.documents(s, d))))

  val oracle: Map[String, String] = Map(
    "p01_clean_corpus" ->
      s"""${Dedup.shingleCte},
         |${Dedup.minhashPairsCtes},
         |losers AS (SELECT DISTINCT doc_b AS doc_id FROM mh_pairs WHERE jac >= 0.5),
         |q AS (SELECT doc_id,
         |   len(string_split(text, ' ')) AS n_tokens,
         |   len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
         |  FROM documents),
         |ql AS (SELECT doc_id, n_tokens FROM q
         |  WHERE n_tokens >= 10 AND n_tokens <= 100000
         |    AND CAST(n_punct AS DOUBLE) / n_tokens < 0.2),
         |lc AS (SELECT doc_id,
         |   len(regexp_extract_all(text, '\\b(the|and|of|to|in)\\b')) AS c_en,
         |   len(regexp_extract_all(text, '\\b(der|und|die|das|nicht)\\b')) AS c_de,
         |   len(regexp_extract_all(text, '\\b(le|et|les|des|est)\\b')) AS c_fr,
         |   len(regexp_extract_all(text, '\\b(el|y|los|las|es)\\b')) AS c_es
         |  FROM documents),
         |lang AS (SELECT doc_id, 'en' AS lang_pred FROM lc
         |  WHERE c_en + c_de + c_fr + c_es > 0
         |    AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_es),
         |keepers AS (SELECT min(doc_id) AS doc_id
         |  FROM (SELECT doc_id, md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS h
         |        FROM documents) GROUP BY h)
         |SELECT d.doc_id, lang.lang_pred, ql.n_tokens
         |FROM documents d
         |JOIN ql ON d.doc_id = ql.doc_id
         |JOIN lang ON d.doc_id = lang.doc_id
         |WHERE d.doc_id IN (SELECT doc_id FROM keepers)
         |  AND d.doc_id NOT IN (SELECT doc_id FROM losers)
         |ORDER BY d.doc_id""".stripMargin)
}
