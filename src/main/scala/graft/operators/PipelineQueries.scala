package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Training-data-pipeline battery #3: the corpus-curation steps DOWNSTREAM
  * of candidate generation — duplicate-group resolution (connected
  * components + canonical pick), retrieval scoring (BM25), deterministic
  * stratified sampling, and document chunking. Everything here is
  * oracle-checked: edges/hashes/scores use only arithmetic both engines
  * reproduce bit-for-bit (no xxhash64 in result-bearing positions). */
object PipelineQueries {

  private def tokens(c: org.apache.spark.sql.Column) = split(c, " ")

  /** q56's oracle CTE fragment: token-Jaccard pairs at threshold `t`
    * within source blocks — reused by q57 as the duplicate edge set. */
  private def jaccardPairsCte(t: Double): String =
    s"""toks AS (SELECT doc_id, source,
       |    list_distinct(string_split(text, ' ')) AS t FROM documents),
       |pairs AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2
       |  FROM toks a JOIN toks b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
       |      / len(list_distinct(a.t || b.t)) >= $t)""".stripMargin

  val registry: Map[String, QueryDef] = Map(

    // ── duplicate-group resolution: prefix-filtered Jaccard pairs (q56
    //    semantics, t=0.5) → connected components (large-star/small-star)
    //    → per-doc (component, cluster size, canonical flag). The oracle
    //    recomputes reachability as a DuckDB recursive CTE — a genuinely
    //    independent algorithm (BFS label spread vs star contraction). ──
    "q57_dup_components" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val edges = DedupQueries.tokenPrefixJoin(docs, threshold = 0.5)
          .select(col("id1").as("u"), col("id2").as("v"))
        val comps = ConnectedComponents.components(
          docs.select(col("doc_id").as("id")), edges)
        val sizes = comps.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
        comps.join(sizes, Seq("component"))
          .select(col("id").as("doc_id"), col("component"),
            col("cluster_size"),
            (col("id") === col("component")).cast("int").as("is_canonical"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE ${jaccardPairsCte(0.5)},
             |edges AS (SELECT id1 AS u, id2 AS v FROM pairs
             |          UNION ALL SELECT id2, id1 FROM pairs),
             |reach AS (
             |  SELECT doc_id AS id, doc_id AS comp FROM documents
             |  UNION
             |  SELECT e.v AS id, r.comp FROM reach r JOIN edges e ON e.u = r.id
             |  WHERE r.comp < e.v),
             |comps AS (SELECT id AS doc_id, MIN(comp) AS component
             |          FROM reach GROUP BY id)
             |SELECT c.doc_id, c.component,
             |  CAST(n.cluster_size AS BIGINT) AS cluster_size,
             |  CAST(c.doc_id = c.component AS INT) AS is_canonical
             |FROM comps c JOIN (SELECT component, COUNT(*) AS cluster_size
             |                   FROM comps GROUP BY 1) n USING (component)
             |ORDER BY doc_id""".stripMargin)),

    // ── BM25 retrieval (k1=1.2, b=0.75) for a fixed query, top-20. tf
    //    joins carry integer counts; the only floats are the final scoring
    //    expression, identical term-for-term in both engines, rounded to
    //    6 decimals to absorb summation-order ulps. df is computed from
    //    the tf relation (already term-filtered) — never a full-vocabulary
    //    aggregation. ──
    "q58_bm25" -> QueryDef(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val terms = Seq("spark", "merge", "window")
        val dl = docs.select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("dl"))
        val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
        val tf = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
          .filter(col("token").isInCollection(terms))
          .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("token"))
          .agg(count_distinct(col("doc_id")).as("df"))
        tf.join(broadcast(df), Seq("token"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .withColumn("contrib",
            log(lit(1) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
              col("tf") * 2.2 /
              (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
          .groupBy(col("doc_id"))
          .agg(round(sum(col("contrib")), 6).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |            FROM documents),
             |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
             |stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
             |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
             |       WHERE token IN ('spark', 'merge', 'window') GROUP BY 1, 2),
             |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
             |scored AS (
             |  SELECT t.doc_id,
             |    SUM(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             |        * t.tf * 2.2 / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS score
             |  FROM tf t JOIN df d USING (token) JOIN dl l USING (doc_id), stats s
             |  GROUP BY 1)
             |SELECT doc_id, ROUND(score, 6) AS bm25
             |FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)),

    // ── deterministic exact-quota stratified sampling: 25% per source
    //    stratum, membership decided by a multiplicative integer hash of
    //    doc_id (identical arithmetic both engines — content-addressed, so
    //    the sample is stable across runs, partitionings and cluster
    //    sizes, unlike rand()-based sampling). Exact quota via per-stratum
    //    rank; the window shuffles once on `source` — stratum counts are
    //    corpus-sized/cardinality-bounded, and at 100 TB the same operator
    //    drops the rank and keeps `hv % 10000 < rate*10000` (approximate
    //    quota, no window) — both shapes share the hash column. ──
    "q59_stratified_sample" -> QueryDef(
      (s, d) => {
        val hv = (col("doc_id") * lit(2654435761L)) % lit(1000000007L)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), hv.as("hv"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
          .filter(col("rk") <= ceil(col("n") * 0.25))
          .select(col("doc_id"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH h AS (SELECT doc_id, source,
             |    (doc_id * 2654435761) % 1000000007 AS hv FROM documents),
             |r AS (SELECT doc_id, source, hv,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rk,
             |    COUNT(*) OVER (PARTITION BY source) AS n FROM h)
             |SELECT doc_id, source FROM r WHERE rk <= CEIL(n * 0.25)
             |ORDER BY doc_id""".stripMargin)),

    // ── document chunking: 32-token windows at stride 24 (8-token
    //    overlap), trailing partial window kept — the standard
    //    context-window preparation step. Pure per-row explode: no
    //    shuffle, scales embarrassingly. ──
    "q60_doc_chunks" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("tk"),
          explode(sequence(lit(1), size(col("tk")), lit(24))).as("s"))
        .select(col("doc_id"),
          ((col("s") - 1) / 24).cast("long").as("chunk_id"),
          size(slice(col("tk"), col("s"), lit(32))).cast("long").as("n_chunk_tokens"),
          concat_ws(" ", slice(col("tk"), col("s"), lit(32))).as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |st AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1, 24)) AS s FROM t)
             |SELECT doc_id, CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
             |  CAST(len(list_slice(tk, s, s + 31)) AS BIGINT) AS n_chunk_tokens,
             |  array_to_string(list_slice(tk, s, s + 31), ' ') AS chunk_text
             |FROM st ORDER BY doc_id, chunk_id""".stripMargin))
  )
}
