"""Generate a deterministic sf1 `documents` table (10x sf0.1) for the
dedup-family scaling decade.

The driver's testdata stops at sf0.1 (5,000 docs); the dedup family's
0.01->0.1 step is the steepest in SCALING.md, so the 100 TB claim needs
one more decade. This generator MIRRORS the measured shape of the driver's
corpus rather than upsampling it (replicating rows 10x would multiply the
near-dup candidate density 10x and make the comparison unfair): uniform
10..100 words/doc, same language mix (en 40%, de/es/fr/zh 15%), 20
uniform sources, and the same ~0.16% planted exact-duplicate rate plus a
matching trickle of one-word-edit near-dups. Seed-fixed; output is cached
at the target dir.

VOCABULARY SCALES WITH THE CORPUS (Heaps' law): the driver corpus uses a
31-word vocabulary; replaying that vocabulary at 10x the docs saturates
the 3-gram shingle space (<= 31^3 distinct shingles), so every posting
list grows ~10x denser and exact-Jaccard pair generation degenerates
quadratically — a density regime REAL corpora never enter (their shingle
diversity grows with size; near-all shingles stay rare). Holding
docs-per-shingle constant across the decade needs vocab x 10^(1/3):
31 -> 67 words. Measured without this correction, dedup_ngram_jaccard
OOMs a 32-thread local JVM at 50k docs — that is a statement about the
toy vocabulary, not the posting-list plan, and the corrected corpus is
the honest scaling instrument.

Usage: python tools/gen_sf1_docs.py [out_dir]   (default /tmp/spark_graft_sf1)
"""

from __future__ import annotations

import os
import sys

N_DOCS = 50_000
SEED = 20260815

_BASE_VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "batch", "part", "line", "order", "sort",
    "fast", "scan", "hash", "slow", "group", "agg", "filter", "query",
    "big", "key", "row", "join", "shuffle", "cache", "plan", "a",
]
# Heaps-law growth: 10x docs -> vocab x 10^(1/3), keeping the expected
# docs-per-shingle density of the sf0.1 corpus (see module docstring)
VOCAB = _BASE_VOCAB + [f"{w}x" for w in _BASE_VOCAB] + [
    "read", "write", "push", "prune", "skew", "salt", "probe", "build",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]


def generate(out_dir: str) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 100 and r < 0.0016:  # planted exact duplicate
            texts.append(texts[int(rng.integers(0, i))])
        elif i > 100 and r < 0.0032:  # planted one-word-edit near-dup
            base = texts[int(rng.integers(0, i))].split()
            base[int(rng.integers(0, len(base)))] = str(
                vocab[int(rng.integers(0, len(vocab)))]
            )
            texts.append(" ".join(base))
        else:
            n = int(rng.integers(10, 101))
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), n)]))
    langs = rng.choice(LANGS, size=N_DOCS, p=LANG_P)
    sources = np.array([f"src{i}" for i in rng.integers(0, 20, N_DOCS)])
    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(langs.tolist()),
            "source": pa.array(sources.tolist()),
            "n_chars": pa.array(
                [len(t) for t in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(tbl, path)
    return out_dir


N_VECS = 20_000  # 10x the sf0.1 embeddings table


def generate_embeddings(out_dir: str) -> str:
    """Deterministic sf1 `embeddings` table (10x sf0.1, same shape): the
    driver's vectors are uniform random unit 64-dim floats with ~balanced
    labels 0-9 (measured: cosine of a vector to its own label centroid is
    ~0.07 ≈ chance — the labels carry no geometry), so the honest 10x
    instrument is exactly that, seed-fixed. The ANN-family scaling decade
    keeps the query set FIXED (vec_id < 20) and grows only the corpus —
    the production question is corpus growth, not query growth."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED + 1)
    v = rng.standard_normal((N_VECS, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), type=pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in v], type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                (np.arange(N_VECS) % 10).astype(np.int32)
            ),
        }
    )
    pq.write_table(tbl, path)
    return out_dir


N_EVENTS = 1_000_000  # 10x the sf0.1 events table
N_USERS = 15_000  # 10x the sf0.1 user population (both axes grow)
N_ORDERS = 1_500_000  # 10x the sf0.1 orders table
N_CUSTOMERS = 150_000  # 10x the sf0.1 customer table


def generate_events(out_dir: str) -> str:
    """Deterministic sf1 `events` table (10x sf0.1, same measured shape):
    uniform event types over {view, click, signup, purchase, error},
    uniform timestamps across the same 30-day window, value ~ U[0, 560],
    and 10x the user population — BOTH axes grow, the production regime
    for the sessionization / funnel / HLL queries (a fixed user set at
    10x events would shrink per-user gaps 10x and make session counts
    unrealistically easy). Timestamps are written at microsecond
    precision; the event queries' ``_epoch_s`` branches on physical
    representation, so nanos-long (driver corpus) and timestamp (this
    corpus) read identically."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "events.parquet")
    if os.path.exists(path):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED + 2)
    base_us = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
    span_us = 30 * 86_400 * 1_000_000
    ts = base_us + rng.integers(0, span_us, N_EVENTS)
    types = rng.choice(
        ["view", "click", "signup", "purchase", "error"], size=N_EVENTS
    )
    ks = rng.integers(0, 100, N_EVENTS)
    tbl = pa.table(
        {
            "event_id": pa.array(range(N_EVENTS), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, N_USERS, N_EVENTS), type=pa.int64()
            ),
            "event_type": pa.array(types.tolist()),
            "value": pa.array(
                np.round(rng.random(N_EVENTS) * 560.0, 2), type=pa.float64()
            ),
            "props": pa.array([f'{{"k": {k}}}' for k in ks]),
        }
    )
    pq.write_table(tbl, path)
    return out_dir


def generate_orders_dims(out_dir: str) -> str:
    """Deterministic sf1 `orders` + `customer` + `nation` (10x sf0.1,
    same measured shape — 1995..2001 order dates, 3 statuses, 5
    priorities, totalprice ~ U[1k, 500k], 25 nations): the inputs of the
    sketch family (`approx_distinct_hll` over (priority, custkey)) and
    the calendar-grid family (`monthly_gap_fill` — the nation x month
    grid stays CONSTANT across the decade; only the aggregated fact
    grows)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    opath = os.path.join(out_dir, "orders.parquet")
    if os.path.exists(opath):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED + 3)
    day_us = 86_400 * 1_000_000
    base_us = 788_918_400_000_000  # 1995-01-01T00:00:00Z
    dates = base_us + rng.integers(0, 2404, N_ORDERS) * day_us
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(N_ORDERS), type=pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, N_CUSTOMERS, N_ORDERS), type=pa.int64()
                ),
                "o_orderstatus": pa.array(
                    rng.choice(["F", "O", "P"], size=N_ORDERS).tolist()
                ),
                "o_totalprice": pa.array(
                    np.round(1000.0 + rng.random(N_ORDERS) * 499000.0, 2)
                ),
                "o_orderdate": pa.array(dates, type=pa.timestamp("us")),
                "o_orderpriority": pa.array(
                    rng.choice(
                        [f"{i}-PRIO" for i in range(1, 6)], size=N_ORDERS
                    ).tolist()
                ),
            }
        ),
        opath,
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(N_CUSTOMERS), type=pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(N_CUSTOMERS)]
                ),
                "c_nationkey": pa.array(
                    (np.arange(N_CUSTOMERS) % 25).astype(np.int32)
                ),
                "c_acctbal": pa.array(
                    np.round(rng.random(N_CUSTOMERS) * 11000.0 - 1000.0, 2)
                ),
                "c_mktsegment": pa.array(
                    rng.choice(
                        ["AUTOMOBILE", "BUILDING", "FURNITURE",
                         "HOUSEHOLD", "MACHINERY"],
                        size=N_CUSTOMERS,
                    ).tolist()
                ),
            }
        ),
        os.path.join(out_dir, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), type=pa.int32()),
                "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
                "n_regionkey": pa.array(
                    [i % 5 for i in range(25)], type=pa.int32()
                ),
            }
        ),
        os.path.join(out_dir, "nation.parquet"),
    )
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    print(generate(out))
    print(generate_embeddings(out))
    print(generate_events(out))
    print(generate_orders_dims(out))
