#!/usr/bin/env python3
"""Synthesize a 10x (or Nx) scale probe dataset from an existing sf dir.

Usage: python3 tools/gen_scale.py <srcSfDir> <outDir> [copies]

Each fact table is replicated `copies` times with keys shifted by a
disjoint per-copy offset, preserving referential integrity (orders ->
customer, lineitem -> orders/part/supplier, events.user_id -> customer,
embeddings.vec_id -> documents.doc_id) and exact dtypes (including the
events table's INT64 TIMESTAMP(NANOS) column). Document text gets a
per-copy marker token prepended (n_chars updated) so exact-dup structure
is preserved per copy instead of planting 10-way duplicate clusters;
embeddings get a small per-copy additive perturbation for the same
reason. region/nation stay single-copy (dimensions).

With --organic (r7): UNIQUE-CONTENT scaling instead of replication.
The replicated probe confounds corpus growth with near-dup-density
growth (every doc gains copies-1 cross-copy twins -> ~copies^2 true
pair volume), so per-query growth ratios are unreviewable against a
linear yardstick. Organic mode gives each copy disjoint content with
the same STRUCTURAL marginals: document texts get a per-copy alphabet
rotation (token/doc lengths, whitespace, within-copy duplicate and
df distributions all preserved; cross-copy shingles disjoint), and
embeddings get a per-copy offset + renormalize (unit norms and
within-copy cosine structure preserved; cross-copy clusters
separated). Copy 0 is bit-identical to the source, so the source-dir
bench numbers ARE the 1x baseline. Caveat: rotation is not a
stopword- or language-model-preserving map, so stopword-/LM-sensitive
scores (q32/q34/q65/q72 families) shift on copies > 0 — the organic
probe is for the SIMILARITY battery, where content identity is the
variable under test.

With --fix-source NAME (r10 verdict task #2): deployment-shape scaling
for the decontamination family. The organic probe scales EVERY source,
including the eval suite (src0) — so suite-vs-train queries (q61, q111,
q133-q136) measure a quadratic both-sides-grow protocol no deployment
runs (a real eval suite is fixed while the train corpus grows). This
mode keeps NAME's documents (and their embeddings, via the
vec_id == doc_id contract) in copy 0 ONLY: copies > 0 carry the other
sources, so the suite stays bit-identical to the source dir while the
train side scales Nx.

Dev tooling only (scale probes) — NOT part of the shipped library and
NOT a replacement for the driver's testdata.
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

OFF = 10_000_000  # > every key in the source tables

def shifted(table: pa.Table, i: int, keycols: list[str]) -> pa.Table:
    for c in keycols:
        idx = table.schema.get_field_index(c)
        col = pc.add(table.column(c), pa.scalar(OFF * i, table.schema.field(c).type))
        table = table.set_column(idx, table.schema.field(c), col)
    return table

def rotate_text(text: str, rot: int) -> str:
    """Per-copy alphabet rotation: [a-z] by rot, [A-Z] by rot, digits by
    rot mod 10. Length-, case- and whitespace-preserving, deterministic,
    and injective per copy — so within-copy duplicate/df structure is
    exactly preserved while copies share (almost) no shingles."""
    lo = "abcdefghijklmnopqrstuvwxyz"
    up = lo.upper()
    dg = "0123456789"
    table = str.maketrans(
        lo + up + dg,
        lo[rot:] + lo[:rot] + up[rot:] + up[:rot]
        + dg[rot % 10:] + dg[:rot % 10])
    return text.translate(table)

def main():
    argv = sys.argv[1:]
    fix_source = None
    if "--fix-source" in argv:
        k = argv.index("--fix-source")
        fix_source = argv[k + 1]
        argv = argv[:k] + argv[k + 2:]
    args = [a for a in argv if a != "--organic"]
    organic = "--organic" in argv
    src, out = args[0], args[1]
    copies = int(args[2]) if len(args) > 2 else 10
    os.makedirs(out, exist_ok=True)

    plain_keys = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    # one FILE per (copy, slice): a single compact parquet file is ONE
    # Spark input split (maxPartitionBytes >> file size), which starves
    # map-side parallelism for the explode-heavy document queries — and
    # misrepresents a real corpus, which is always many files
    SLICES = 4
    def write_sharded(t, make_copy):
        d = f"{out}/{t}.parquet"
        os.makedirs(d, exist_ok=True)
        for i in range(copies):
            tab = make_copy(i)
            n = tab.num_rows
            for sl in range(SLICES):
                lo = n * sl // SLICES
                hi = n * (sl + 1) // SLICES
                pq.write_table(tab.slice(lo, hi - lo),
                               f"{d}/part-{i:02d}-{sl}.parquet")
    for t in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{out}/{t}.parquet")
    for t, keys in plain_keys.items():
        base = pq.read_table(f"{src}/{t}.parquet")
        write_sharded(t, lambda i, base=base, keys=keys: shifted(base, i, keys))

    docs = pq.read_table(f"{src}/documents.parquet")
    # --fix-source: the fixed suite rides copy 0 only; copies > 0 drop
    # its documents (and, below, their embeddings) so the suite stays
    # bit-identical while the train side scales
    fixed_ids = set()
    if fix_source is not None:
        mask = pc.equal(docs.column("source"), pa.scalar(fix_source))
        fixed_ids = set(docs.filter(mask).column("doc_id").to_pylist())
        docs_scaling = docs.filter(pc.invert(mask))
    def scaling_base(i):
        return docs if (fix_source is None or i == 0) else docs_scaling
    def doc_copy_organic(i):
        t = shifted(scaling_base(i), i, ["doc_id"])
        if i > 0:
            # 3i mod 26 is distinct for i in [0, 9) x3 steps -> disjoint
            # alphabets for up to 26/gcd(3,26) = 26 copies
            rot = (3 * i) % 26
            text = pa.array(
                [rotate_text(x, rot) for x in t.column("text").to_pylist()],
                type=t.schema.field("text").type)
            ti = t.schema.get_field_index("text")
            t = t.set_column(ti, t.schema.field("text"), text)
        return t
    def doc_copy(i):
        if organic:
            return doc_copy_organic(i)
        t = shifted(scaling_base(i), i, ["doc_id"])
        if i > 0:
            marker = f"c{i} "
            text = pc.binary_join_element_wise(
                pa.scalar(marker), t.column("text"), pa.scalar(""))
            ti = t.schema.get_field_index("text")
            t = t.set_column(ti, t.schema.field("text"), text)
            ni = t.schema.get_field_index("n_chars")
            nc = pc.add(t.column("n_chars"),
                        pa.scalar(len(marker), t.schema.field("n_chars").type))
            t = t.set_column(ni, t.schema.field("n_chars"), nc)
        return t
    write_sharded("documents", doc_copy)

    emb = pq.read_table(f"{src}/embeddings.parquet")
    etype = emb.schema.field("embedding").type
    if fixed_ids:
        emb_mask = pc.is_in(emb.column("vec_id"),
                            value_set=pa.array(sorted(fixed_ids),
                                               type=emb.schema.field("vec_id").type))
        emb_scaling = emb.filter(pc.invert(emb_mask))
    def emb_base(i):
        return emb if (not fixed_ids or i == 0) else emb_scaling
    def emb_copy_organic(i):
        t = shifted(emb_base(i), i, ["vec_id"])
        if i > 0:
            flat = t.column("embedding").combine_chunks()
            dims = len(flat[0])
            vals = np.array(flat.values.to_pylist(),
                            dtype=np.float32).reshape(-1, dims)
            # one offset vector per copy: within-copy geometry rides
            # along (near-dup pairs stay near), copies separate; then
            # renormalize so the unit-norm marginal is preserved
            off = np.random.default_rng(i).normal(0.0, 0.25, dims) \
                .astype(np.float32)
            vals = vals + off
            vals /= np.linalg.norm(vals, axis=1, keepdims=True)
            newcol = pa.ListArray.from_arrays(
                flat.offsets, pa.array(vals.ravel(), type=flat.values.type))
            ei = t.schema.get_field_index("embedding")
            t = t.set_column(ei, t.schema.field("embedding"), newcol.cast(etype))
        return t
    def emb_copy(i):
        if organic:
            return emb_copy_organic(i)
        t = shifted(emb_base(i), i, ["vec_id"])
        if i > 0:
            flat = t.column("embedding").combine_chunks()
            vals = pc.add(flat.values, pa.scalar(0.01 * i, flat.values.type))
            newcol = type(flat).from_arrays(flat.offsets, vals)
            ei = t.schema.get_field_index("embedding")
            t = t.set_column(ei, t.schema.field("embedding"), newcol.cast(etype))
        return t
    write_sharded("embeddings", emb_copy)
    print(f"wrote {copies}x of {src} to {out}"
          + (f" (fixed suite: {fix_source})" if fix_source else ""))

if __name__ == "__main__":
    main()
