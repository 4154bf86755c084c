"""Arrow-batched (pandas UDF) kernels for the sketch operators.

NOTE: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` resolves the type hints at decoration time and PEP 563
stringified hints break that.

These kernels are bit-identical to their Column-expression twins in
:mod:`.dedup` (same hash params, same modular arithmetic) but run one numpy
broadcast per Arrow batch instead of N interpreted array passes per row.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_minhash_sig_udf(params, mersenne_p):
    a = np.array([p[0] for p in params], dtype=np.uint64)
    b = np.array([p[1] for p in params], dtype=np.uint64)
    p64 = np.uint64(mersenne_p)

    @pandas_udf("array<long>")
    def sig(hs: pd.Series) -> pd.Series:
        if len(hs) == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(x) for x in hs), dtype=np.int64, count=len(hs))
        flat = (
            np.concatenate([np.asarray(x, dtype=np.uint64) for x in hs])
            if lens.sum()
            else np.empty(0, dtype=np.uint64)
        )
        # (a*x + b) mod p: a,x < 2^31 → product < 2^62, exact in uint64
        m = (flat[:, None] * a[None, :] + b[None, :]) % p64
        offsets = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        # every doc has ≥1 shingle (shingles() emits the whole text for
        # short docs), so no zero-length reduceat segments
        mins = np.minimum.reduceat(m, offsets, axis=0).astype(np.int64)
        return pd.Series(list(mins))

    return sig


def make_cosine_pairs_mapper(ids, matrix, threshold, id_col="vec_id"):
    """mapInPandas kernel for all-pairs cosine over integer-scaled vectors.

    ``matrix`` is the full corpus as an int64 ndarray (n × dim) — tiny
    relative to the pair count (n² pairs never materialize outside numpy).
    Dots are exact: |x| ≤ scale·max|v| keeps x·y·dim < 2^53, so the float64
    matmul is integer-exact and the final divide matches a SQL engine's
    ``CAST(int_dot AS DOUBLE)/ (sqrt(ii)*sqrt(jj))`` bit-for-bit.

    Emits (id_a, id_b, cosine) with id_a < id_b and cosine ≥ threshold.
    """
    ids = np.asarray(ids, dtype=np.int64)
    m = np.asarray(matrix, dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    order = np.argsort(ids)
    ids_sorted = ids[order]
    m_sorted = m[order]

    def mapper(batches):
        for pdf in batches:
            batch_ids = pdf[id_col].to_numpy(dtype=np.int64)
            vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf["iv"]])
            if len(batch_ids) == 0:
                continue
            dots = vecs @ m_sorted.T
            bnorms = np.sqrt((vecs * vecs).sum(axis=1))
            cos = dots / (bnorms[:, None] * norms[None, :])
            # id_a < id_b and threshold, row block vs whole corpus
            keep_i, keep_j = np.where(
                (batch_ids[:, None] < ids_sorted[None, :]) & (cos >= threshold)
            )
            yield pd.DataFrame(
                {
                    "id_a": batch_ids[keep_i],
                    "id_b": ids_sorted[keep_j],
                    "cosine": cos[keep_i, keep_j],
                }
            )

    return mapper


def make_cosine_scores_mapper(q_ids, q_matrix, id_col="vec_id"):
    """mapInPandas kernel scoring every corpus row against a fixed query
    matrix: emits (query_id, corpus_id, cosine) for all non-self pairs.
    Same integer-exactness contract as :func:`make_cosine_pairs_mapper`."""
    q_ids = np.asarray(q_ids, dtype=np.int64)
    q = np.asarray(q_matrix, dtype=np.float64)
    q_norms = np.sqrt((q * q).sum(axis=1))

    def mapper(batches):
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            if len(c_ids) == 0:
                continue
            vecs = np.array([np.asarray(v, dtype=np.float64) for v in pdf["iv"]])
            dots = q @ vecs.T                      # (n_q, batch)
            c_norms = np.sqrt((vecs * vecs).sum(axis=1))
            cos = dots / (q_norms[:, None] * c_norms[None, :])
            keep_q, keep_c = np.where(q_ids[:, None] != c_ids[None, :])
            yield pd.DataFrame(
                {
                    "query_id": q_ids[keep_q],
                    "corpus_id": c_ids[keep_c],
                    "cosine": cos[keep_q, keep_c],
                }
            )

    return mapper


def make_fingerprint_udf(params, mersenne_p):
    """Fused portable fingerprint kernel: raw shingle strings →
    ``struct(hs, sig)`` in ONE Arrow pass.

    Replicates the JVM portable pipeline bit-for-bit —
    ``pmod(conv(substring(md5(s),1,15),16,10), p)`` per shingle,
    ``array_distinct`` over the HASH values (first-occurrence order, so a
    pmod collision merges exactly as the Column form does), then the
    MinHash signature over the distinct hashes — but md5 runs in
    hashlib (C) instead of per-element inside an interpreted
    higher-order ``transform``, and the signature shares the same pass,
    so the JVM↔Python boundary is crossed once per batch instead of the
    hash array crossing separately into the signature kernel."""
    import hashlib

    a = np.array([p[0] for p in params], dtype=np.uint64)
    b = np.array([p[1] for p in params], dtype=np.uint64)
    p64 = np.uint64(mersenne_p)
    p_int = int(mersenne_p)
    md5 = hashlib.md5

    @pandas_udf("struct<hs: array<long>, sig: array<long>>")
    def fp(sh: pd.Series) -> pd.DataFrame:
        hs_out, sig_out = [], []
        for shingles in sh:
            if shingles is None:
                hs_out.append(None)
                sig_out.append(None)
                continue
            seen = dict.fromkeys(
                int(md5(s.encode("utf-8")).hexdigest()[:15], 16) % p_int
                for s in shingles
            )
            hs = np.fromiter(seen, dtype=np.uint64, count=len(seen))
            m = (hs[:, None] * a[None, :] + b[None, :]) % p64
            hs_out.append(hs.astype(np.int64))
            sig_out.append(m.min(axis=0).astype(np.int64))
        return pd.DataFrame({"hs": hs_out, "sig": sig_out})

    return fp


def make_simhash_udf(num_bits):
    shifts = np.arange(num_bits, dtype=np.uint64)

    @pandas_udf("long")
    def sh(hs: pd.Series) -> pd.Series:
        if len(hs) == 0:
            return pd.Series([], dtype=np.int64)
        out = np.empty(len(hs), dtype=np.int64)
        for i, x in enumerate(hs):
            h = np.asarray(x, dtype=np.uint64)
            # bit j set iff strictly more than half the hashes have bit j
            ones = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
            fp = np.uint64(0)
            bits = np.where(ones * 2 > len(h))[0]
            for j in bits:
                fp |= np.uint64(1) << np.uint64(j)
            out[i] = np.int64(fp)
        return pd.Series(out)

    return sh


def make_probe_cells_udf(centroids_int, n_probe):
    """Multi-probe IVF assignment: the ``n_probe`` nearest cell indices per
    vector (exact integer squared-L2, ties to the lower index via stable
    argsort). Returns array<int> — the caller explodes it."""
    cents = np.asarray(centroids_int, dtype=np.int64)

    @pandas_udf("array<int>")
    def probes(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.array([np.asarray(v, dtype=np.int64) for v in vs])
        diff = x[:, None, :] - cents[None, :, :]
        d2 = (diff * diff).sum(axis=2)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe].astype("int32")
        return pd.Series(list(order))

    return probes


def make_nearest_cell_udf(centroids_int):
    """IVF coarse-quantizer assignment over integer-scaled vectors: argmin
    of the EXACT integer squared-L2 (int64 — diffs < 2^24, 64-dim sums
    < 2^54) so every engine reproduces the same cell, ties to the lowest
    index. One numpy broadcast per Arrow batch; the centroid matrix rides
    in the UDF closure (KiB-scale), not as literal plan expressions — an
    unrolled per-cell Column expression is interpreted per row AND bloats
    the task binary by O(cells × dim) literals."""
    cents = np.asarray(centroids_int, dtype=np.int64)  # (C, dim)

    @pandas_udf("int")
    def nearest(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        x = np.array([np.asarray(v, dtype=np.int64) for v in vs])
        diff = x[:, None, :] - cents[None, :, :]
        d2 = (diff * diff).sum(axis=2)
        # argmin keeps the first (lowest) cell index on ties, matching the
        # oracle's list_position(d2, list_min(d2)) scan order
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return nearest


def make_multitable_lsh_udf(tables_int):
    """All L tables' sign-LSH bucket ids in one Arrow batch: for each
    table, bucket bit i = (X @ plane_i) > 0 — a single int64 matmul per
    table (exact: |terms| < 2^41, 64-dim sums < 2^47), weights 1 << i
    matching ``similarity.lsh_signature`` and the oracle's CASE chain.
    Replaces L × planes interpreted higher-order aggregate() expressions
    per row (the repo-documented 10-60× HOF trap) with numpy."""
    planes = [np.asarray(t, dtype=np.int64) for t in tables_int]

    @pandas_udf("array<long>")
    def buckets(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        x = np.array([np.asarray(v, dtype=np.int64) for v in vs])
        out = np.zeros((len(x), len(planes)), dtype=np.int64)
        for t, pl in enumerate(planes):
            sign = (x @ pl.T) > 0  # (n, n_planes)
            out[:, t] = (sign * (1 << np.arange(pl.shape[0], dtype=np.int64))).sum(
                axis=1
            )
        return pd.Series(list(out))

    return buckets


def make_repetition_stats_udf():
    """Per-document bigram repetition stats in ONE Arrow pass:
    ``array<string> shingles → struct(top, n)`` where ``top`` is the count
    of the most frequent element and ``n`` the array length.

    Replaces the explode → groupBy(doc, g) → groupBy(doc) staging, which
    shuffled the full token stream twice to compute a metric that is
    row-local (each document's statistic depends only on its own array) —
    the guide-§8 proxy rule in miniature: never shuffle a corpus to decide
    per-row facts. Counting runs in numpy (unique over a factorized view)
    per batch."""

    @pandas_udf("struct<top: bigint, n: bigint>")
    def stats(arrs: pd.Series) -> pd.DataFrame:
        tops = np.zeros(len(arrs), dtype=np.int64)
        ns = np.zeros(len(arrs), dtype=np.int64)
        for i, a in enumerate(arrs):
            if a is None or len(a) == 0:
                continue
            _, counts = np.unique(np.asarray(a, dtype=object), return_counts=True)
            tops[i] = counts.max()
            ns[i] = len(a)
        return pd.DataFrame({"top": tops, "n": ns})

    return stats
