package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE open-vocabulary synthetic corpus profile shared by the
  * measurement harnesses ([[IncrementalBench]], [[RetrievalBench]],
  * [[Bm25StoreBench]]) — a single definition so PERF.md's "same
  * open-vocabulary profile" claim is true by construction: a change to
  * the vocabulary size or frequency exponent reaches every bench.
  * Dev tooling, not part of the registry. */
private[graft] object BenchCorpus {

  /** Deterministic 60-token text for a `seed` column; `variant`
    * (nullable) swaps token 7, making a near-dup of the seed's base
    * text. Token ids are CUBED-uniform over a 20k vocabulary (small
    * ids common, tail rare) — a Zipf-ish frequency profile, so prefix
    * filtering and the BM25 stopword prune operate in their design
    * regime (a uniform vocabulary makes every token equally "rare" and
    * defeats any frequency-based selection — worth knowing, but not
    * the production regime). */
  def zipfText(seed: Column, variant: Column): Column =
    concat_ws(" ", transform(sequence(lit(0), lit(59)),
      i => {
        val h = pmod(xxhash64(
          when(i === 7 && variant.isNotNull, variant)
            .otherwise(seed * 100 + i)), lit(1048576L))
        concat(lit("w"),
          floor(pow(h.cast("double") / 1048576.0, 3.0) * 20000).cast("long"))
      }))

  /** No-variant form: every token derives from the seed alone. */
  def zipfText(seed: Column): Column =
    zipfText(seed, lit(null).cast("long"))
}
