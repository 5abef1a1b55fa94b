package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Training-data-pipeline operators over `documents` and `embeddings`
  * (builder-prompt scope: dedup, similarity search, text analysis).
  * All hot-path logic is native Catalyst expressions (split/transform/
  * aggregate/xxhash64) — no Scala UDFs. */
object TextQueries {

  /** token count = spaces + 1 — robust, identical cross-engine definition. */
  private val nTokensExpr =
    (length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit(""))) + 1)
      .cast("long")

  val registry: Map[String, QueryDef] = Map(

    // ── exact dedup: hash-groupBy on content (documents keyspace) ──
    "q22_exact_dup" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_doc"))
        .orderBy(col("h")),
      Some("""SELECT md5(text) AS h, COUNT(*) AS n_dups, MIN(doc_id) AS keep_doc
             |FROM documents GROUP BY 1 ORDER BY h""".stripMargin)),

    // ── text quality metrics: token count + mean token length ──
    "q23_text_stats" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_seen"),
          nTokensExpr.as("n_tokens"),
          ((length(regexp_replace(col("text"), lit(" "), lit(""))))
            .cast("double") / nTokensExpr).as("avg_token_len"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars_seen,
             |  CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
             |  CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             |    / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS avg_token_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── per-language corpus profile ──
    "q24_lang_profile" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .withColumn("avg_chars", col("sum_chars").cast("double") / col("n"))
        .orderBy(col("lang")),
      Some("""SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── token-count histogram (quality-score binning) ──
    "q25_token_hist" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .groupBy((floor(nTokensExpr / 10) * 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")),
      Some("""SELECT CAST((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) // 10 * 10
             |    AS BIGINT) AS bucket, COUNT(*) AS n
             |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ── brute-force cosine top-k against a probe vector (ANN baseline) ──
    "q26_embed_knn" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val probe = e.orderBy(col("vec_id")).limit(1)
          .select(col("embedding").as("probe"))
        // native VecDot: same per-element double casts and left-to-right
        // fold as the HOF formulation (bit-identical), compiled
        val dot = graft.functions.VecDot(col("embedding"), col("probe"))
        val normA = sqrt(graft.functions.VecDot(col("embedding"), col("embedding")))
        val normB = sqrt(graft.functions.VecDot(col("probe"), col("probe")))
        e.crossJoin(broadcast(probe))
          .select(col("vec_id"), round(dot / (normA * normB), 6).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(10)
      },
      Some("""WITH probe AS (SELECT embedding AS p FROM embeddings ORDER BY vec_id LIMIT 1)
             |SELECT vec_id, ROUND(
             |    list_inner_product(CAST(embedding AS DOUBLE[]), CAST(p AS DOUBLE[]))
             |    / (SQRT(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
             |     * SQRT(list_inner_product(CAST(p AS DOUBLE[]), CAST(p AS DOUBLE[])))), 6) AS cos_sim
             |FROM embeddings, probe
             |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)),

    // ── embedding stats: exact centroid norm per label ──
    "q27_label_centroids" -> QueryDef(
      (s, d) => {
        val e = Tables.embeddings(s, d)
        // mean of dim-0 and dim-63 per label, via exact decimal sums
        e.groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            sum(element_at(col("embedding"), 1).cast("double").cast("decimal(18,8)"))
              .cast("double").as("sum_d0"),
            sum(element_at(col("embedding"), 64).cast("double").cast("decimal(18,8)"))
              .cast("double").as("sum_d63"))
          .orderBy(col("label"))
      },
      Some("""SELECT label, COUNT(*) AS n,
             |  CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(18,8))) AS DOUBLE) AS sum_d0,
             |  CAST(SUM(CAST(CAST(embedding[64] AS DOUBLE) AS DECIMAL(18,8))) AS DOUBLE) AS sum_d63
             |FROM embeddings GROUP BY label ORDER BY label""".stripMargin))
  )
}
