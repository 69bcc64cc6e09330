"""Synthesize a larger scale factor from an existing testdata directory
by DETERMINISTIC replication with shifted keys (VERDICT r4 item 1: prove
the 100x posture by execution, not plan shape alone).

Construction (pure functions of the input — no RNG, reproducible):

- ``region``/``nation`` are copied unchanged: dimensions grow slowly in
  real warehouses, and keeping them fixed preserves the broadcast-side
  semantics of every dim join while the fact side scales.
- Every fact table is replicated R times with each replica's keys
  shifted by ``replica * (max_base_key + 1)`` — replicas are disjoint
  key universes, so per-key group sizes and join fan-outs stay CONSTANT
  while row counts scale linearly. That is the property a scaling
  measurement needs: time-vs-rows exponents are then attributable to
  the PLAN, not to quadratic blowup baked into the data.
- ``documents``: each replica's text gets a per-replica token prefix
  (``r{i}tok`` under the engine's whitespace tokenizer), so shingle and
  MinHash dup structure is isomorphic WITHIN a replica but disjoint
  ACROSS replicas — without this, identical replicated texts would make
  every LSH bucket R x hotter and candidate pairs grow R^2: a data
  artifact, not a plan property. ``n_chars`` is recomputed.
- ``embeddings``: each replica's vectors are cyclically rotated by the
  replica index (norm-preserving, intra-replica geometry identical);
  identical copies would degenerate kNN into R-way distance ties. Query
  vectors (``vec_id < N_QUERIES``) exist only in replica 0, so ANN
  queries serve a FIXED query set against an R x corpus — the serving
  scale story.
- ``events``: timestamps are NOT shifted — the calendar span is fixed
  and per-day/window densities scale with R, matching how an ingest
  actually grows; user_id shifting keeps per-user series lengths fixed.

Oracle checks are intentionally out of scope at synthesized scales (the
driver grades sf0.01; several oracles pin scale-keyed constants); these
directories exist to MEASURE, via bench.py's methodology, how runtimes
move with input size.

Usage:
    python scripts/make_scale.py --base /root/testdata/sf0.1 \
        --out testdata_scaled/sf1 --factor 10
"""

from __future__ import annotations

import argparse
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_TABLES = ["region", "nation"]

EVENT_SLICES = 8  # fixed streaming batch count at any factor (see below)

# table -> columns shifted by replica * (max(col in base PK table) + 1);
# FK columns shift by their REFERENCED table's stride so integrity holds.
KEY_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# stride source -> (table, column) whose max defines the key universe
STRIDE_SRC = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events": ("events", "event_id"),
    "events_user": ("events", "user_id"),
    "documents": ("documents", "doc_id"),
    "embeddings": ("embeddings", "vec_id"),
}


def _prefix_tokens(text: str, i: int) -> str:
    return " ".join(f"r{i}{t}" for t in text.split())


# --- Zipf skew mode (VERDICT r6 item 2) -------------------------------------
# The uniform construction above deliberately keeps per-key group sizes
# constant, so the scaling sweep attributes exponents to the PLAN. But a
# real 100 TB corpus is NOT uniform: boilerplate-heavy document sources
# and celebrity users dominate shuffle keys. ``--zipf`` derives a leg
# where the hot-key path is actually exercised:
#
# - ``events.user_id`` and ``lineitem.l_partkey`` are remapped through a
#   deterministic inverse-CDF Zipf(s) over their replicated key universe
#   (rank 0 = hottest; at s=1.1 over ~30k keys the top key owns ~10% of
#   all rows). Remapped keys stay inside the universe, so dim joins and
#   FK integrity hold.
# - ``documents`` get a Zipf-assigned SOURCE whose shared boilerplate
#   prefix (24 tokens) is prepended to the text: hot sources make hot
#   shingle/MinHash-band buckets — the hot path of every dedup family.
#
# Everything is a pure function of row identity (golden-ratio hash of a
# stable id) — no RNG, reproducible, same properties as the uniform
# replicas otherwise.

ZIPF_S = 1.1
ZIPF_DOC_SOURCES = 1000
ZIPF_BOILER_TOKENS = 24


def _zipf_ranks(ids, universe: int, s: float = ZIPF_S):
    """Map stable integer ids to Zipf-distributed ranks in [0, universe):
    uniform deviate from a golden-ratio hash, then inverse CDF."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.uint64)
    h = (ids * np.uint64(2654435761) + np.uint64(0x9E3779B9)) & np.uint64(
        0x7FFFFFFF)
    p = h.astype(np.float64) / float(2**31)
    w = 1.0 / np.power(np.arange(1, universe + 1, dtype=np.float64), s)
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    return np.minimum(np.searchsorted(cdf, p, side="right"), universe - 1)


def _zipf_remap_column(full, col: str, base_keys, factor: int, stride: int,
                       hash_ids) -> "pa.Table":
    """Replace ``col`` with Zipf-distributed keys drawn from the exact
    replicated universe (base keys + every replica shift), ranked hottest
    -> coldest in key order."""
    import numpy as np

    base_sorted = np.sort(np.asarray(base_keys, dtype=np.int64))
    universe = np.concatenate(
        [base_sorted + i * stride for i in range(factor)])
    ranks = _zipf_ranks(hash_ids, len(universe))
    new_col = pa.array(universe[ranks], type=full.schema.field(col).type)
    return full.set_column(
        full.schema.get_field_index(col), full.schema.field(col), new_col)


def make_scale(base: str, out: str, factor: int, zipf: bool = False) -> None:
    os.makedirs(out, exist_ok=True)
    strides = {}
    for name, (tbl, col) in STRIDE_SRC.items():
        t = pq.read_table(os.path.join(base, f"{tbl}.parquet"), columns=[col])
        strides[name] = int(pc.max(t.column(col)).as_py()) + 1

    for tbl in COPY_TABLES:
        src = os.path.join(base, f"{tbl}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(out, f"{tbl}.parquet"))

    for tbl, keys in KEY_COLS.items():
        t = pq.read_table(os.path.join(base, f"{tbl}.parquet"))
        replicas = []
        for i in range(factor):
            r = t
            for col, stride_name in keys.items():
                shifted = pc.add(
                    pc.cast(r.column(col), pa.int64()),
                    pa.scalar(i * strides[stride_name], pa.int64()),
                )
                idx = r.schema.get_field_index(col)
                # preserve the base dtype (int32 FKs stay int32-safe only
                # for small strides; keys here are int64 in the base data)
                shifted = pc.cast(shifted, t.schema.field(col).type)
                r = r.set_column(idx, t.schema.field(col), shifted)
            if tbl == "documents" and i > 0:
                texts = [
                    _prefix_tokens(x, i) for x in r.column("text").to_pylist()
                ]
                r = r.set_column(
                    r.schema.get_field_index("text"),
                    t.schema.field("text"),
                    pa.array(texts, t.schema.field("text").type),
                )
                r = r.set_column(
                    r.schema.get_field_index("n_chars"),
                    t.schema.field("n_chars"),
                    pa.array(
                        [len(x) for x in texts],
                        t.schema.field("n_chars").type,
                    ),
                )
            if tbl == "embeddings" and i > 0:
                embs = r.column("embedding").to_pylist()
                # Rotation offset cycles over 1..dim-1, never 0: a plain
                # i % dim gives replica i = dim (2dim, ...) a
                # byte-identical copy of replica 0's vectors, which
                # reintroduces the R-way distance-tie artifact the
                # rotation exists to avoid (ADVICE r5).
                rolled = [
                    e[1 + (i - 1) % (len(e) - 1):] + e[: 1 + (i - 1) % (len(e) - 1)]
                    for e in embs
                ]
                r = r.set_column(
                    r.schema.get_field_index("embedding"),
                    t.schema.field("embedding"),
                    pa.array(rolled, t.schema.field("embedding").type),
                )
            replicas.append(r)
        # One part file PER REPLICA under a directory named
        # ``<table>.parquet`` (spark.read.parquet handles directories):
        # parquet split parallelism and the file-stream source's
        # one-input-partition-per-file rule then scale WITH the data —
        # a single concatenated file would serialize map-side work at
        # sf1 purely as a layout artifact.
        #
        # EVENTS are split into TIME SLICES instead of replica copies:
        # every replica spans the full calendar range, so replica-sliced
        # files would arrive wildly out of event-time order at a
        # streaming source — after the first file the watermark sits at
        # the range's end and every later file is 100% late data. Sliced
        # by ts (how an ingest log actually arrives), the watermark
        # advances monotonically file by file and stream state stays
        # watermark-bounded at any scale.
        # Events use a FIXED number of time slices (not one per replica):
        # the streaming replay runs one file per micro-batch, and a real
        # ingest's batch CADENCE does not grow with corpus size — data
        # growth means bigger batches, not more of them. Slices ∝ factor
        # would multiply per-batch stateful-operator overhead (Python
        # state-runner invocations ≈ batches x active keys) into an
        # artificial quadratic.
        full = pa.concat_tables(replicas)
        if zipf and tbl == "events":
            base_users = pc.unique(t.column("user_id")).to_pylist()
            full = _zipf_remap_column(
                full, "user_id", base_users, factor, strides["events_user"],
                full.column("event_id").to_numpy())
        if zipf and tbl == "lineitem":
            base_parts = pc.unique(
                pq.read_table(os.path.join(base, "part.parquet"),
                              columns=["p_partkey"]).column("p_partkey")
            ).to_pylist()
            import numpy as np

            hash_ids = (full.column("l_orderkey").to_numpy() * 8
                        + full.column("l_linenumber").to_numpy())
            full = _zipf_remap_column(
                full, "l_partkey", base_parts, factor, strides["part"],
                hash_ids)
        if zipf and tbl == "documents":
            sources = _zipf_ranks(
                full.column("doc_id").to_numpy(), ZIPF_DOC_SOURCES)
            boiler = {
                s: " ".join(f"s{s}b{j}" for j in range(ZIPF_BOILER_TOKENS))
                for s in set(sources.tolist())
            }
            texts = [
                boiler[s] + " " + x
                for s, x in zip(sources.tolist(),
                                full.column("text").to_pylist())
            ]
            full = full.set_column(
                full.schema.get_field_index("text"),
                t.schema.field("text"),
                pa.array(texts, t.schema.field("text").type))
            full = full.set_column(
                full.schema.get_field_index("n_chars"),
                t.schema.field("n_chars"),
                pa.array([len(x) for x in texts],
                         t.schema.field("n_chars").type))
        if tbl == "events":
            full = full.sort_by([("ts", "ascending"), ("event_id", "ascending")])
            n_parts = EVENT_SLICES
        else:
            n_parts = factor
        tdir = os.path.join(out, f"{tbl}.parquet")
        os.makedirs(tdir, exist_ok=True)
        n = len(full)
        step = (n + n_parts - 1) // n_parts
        t0_ns = time.time_ns()
        for i in range(n_parts):
            chunk = full.slice(i * step, step)
            if len(chunk):
                part = os.path.join(tdir, f"part-{i:04d}.parquet")
                pq.write_table(chunk, part)
                # Strictly increasing mtimes in part-name order, spaced
                # well past the file-stream source's MILLISECOND
                # resolution: micro-batch replay order follows mtime, and
                # a tie would reorder time-sliced events files, silently
                # dropping them as late data (ADVICE r5).
                ns = t0_ns + (i + 1) * 10_000_000  # +10 ms per part
                os.utime(part, ns=(ns, ns))
    print(f"wrote {out} at {factor}x of {base}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--factor", type=int, required=True)
    ap.add_argument("--zipf", action="store_true",
                    help="Zipf-skew hot keys (events.user_id, "
                         "lineitem.l_partkey) and document sources")
    a = ap.parse_args()
    make_scale(a.base, a.out, a.factor, zipf=a.zipf)
