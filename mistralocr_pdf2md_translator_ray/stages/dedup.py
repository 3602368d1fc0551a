"""Near-duplicate detection pipelines over a documents table.

Four detectors, each the standard shape for web-scale dedup:

  sketch per doc (map_batches, vectorized)
    -> explode to (band_key, doc_id) rows
    -> groupby(band_key): buckets with >1 doc emit candidate pairs
    -> verify pairs exactly (Jaccard / Hamming / cosine)
    -> cluster (union-find) -> keep min doc_id per cluster

Scale notes: the shuffle only moves sketch rows (16 x 16B per doc), not
text. Candidate-pair verification is sharded across raw Ray tasks —
each shard reads ONLY its colliding docs via parquet predicate
pushdown and recomputes their shingle sets locally (cheaper than
shipping shingles through the shuffle). Clustering is adaptive:
driver-side union-find while the verified pair list is small
(pairs ~ dup docs, not corpus size), switching to distributed
min-label propagation (bucketed co-group rounds over the edge set)
past ``_UNION_FIND_MAX_PAIRS`` — the two paths are equality-tested.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.dedup import (
    band_hashes,
    char_shingles,
    hamming64,
    jaccard,
    minhash_signature,
    simhash64,
    simhash_bands,
    word_ngrams,
)

_N_PERM = 128
_BANDS = 16


def _read_docs(sf_dir: str) -> "rd.Dataset":
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def _union_find(n_pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Min-label union-find over verified pairs -> {doc_id: root}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in parent}


_UNION_FIND_MAX_PAIRS = 1_000_000


def _removed_by_label_propagation(pairs: list[tuple[int, int]],
                                  num_buckets: int = 32,
                                  max_iters: int = 64) -> set[int]:
    """Connected components by distributed min-label propagation.

    The edge set becomes a Dataset; each round co-groups edges with the
    current labels (one bucketed shuffle) and re-minimizes per node.
    Labels only ever decrease, so the global label sum is a strictly
    decreasing convergence witness — iterate until it is stable (O(
    cluster diameter) rounds; near-dup clusters are star/clique shaped,
    so 2-3 in practice). Returns every node whose final label isn't
    itself (the docs to drop). Memory per task is one bucket's edges,
    never the whole graph.
    """
    from .joins import cogroup

    a = np.fromiter((p[0] for p in pairs), dtype=np.int64, count=len(pairs))
    b = np.fromiter((p[1] for p in pairs), dtype=np.int64, count=len(pairs))
    # both directions so min labels flow either way along an edge
    edges = rd.from_arrow(pa.table({
        "node": pa.array(np.concatenate([a, b])),
        "nbr": pa.array(np.concatenate([b, a])),
    }))
    nodes = np.unique(np.concatenate([a, b]))
    labels = rd.from_arrow(pa.table({
        "nbr": pa.array(nodes), "lbl": pa.array(nodes)}))

    from ray.data.aggregate import Sum

    from ..functions.hashing import bucket_ids

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        # ldf: edges (node, nbr); rdf: labels (nbr, lbl). Emit each
        # node's neighbor-label candidates plus the neighbor's own
        # self-entry so isolated labels survive the round.
        m = ldf.merge(rdf, on="nbr", how="inner")[["node", "lbl"]]
        own = rdf.rename(columns={"nbr": "node"})[["node", "lbl"]]
        out = pd.concat([m, own], ignore_index=True)
        out = out.astype({"node": "int64", "lbl": "int64"})
        return out.groupby("node", as_index=False).agg(lbl=("lbl", "min"))

    def add_node_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("nb", bucket_ids(t["node"], num_buckets))

    def re_min(g: pd.DataFrame) -> pd.DataFrame:
        # node cardinality ~ dup-doc count (can be huge): bucketed
        # combine, never Ray's sort aggregate (fixed cost per task at
        # high key counts — see BASELINE.md)
        out = g.groupby("node", as_index=False).agg(lbl=("lbl", "min"))
        return pd.DataFrame({"nbr": out["node"].astype("int64"),
                             "lbl": out["lbl"].astype("int64")})

    prev_sum = None
    for _ in range(max_iters):
        new_labels = (
            cogroup(
                edges, labels, on=["nbr"], merge_fn=merge,
                left_schema=pa.schema([("node", pa.int64()), ("nbr", pa.int64())]),
                right_schema=pa.schema([("nbr", pa.int64()), ("lbl", pa.int64())]),
                num_buckets=num_buckets,
            )
            .map_batches(add_node_bucket, batch_format="pyarrow")
            .groupby("nb")
            .map_groups(re_min, batch_format="pandas")
            .materialize()
        )
        cur_sum = new_labels.aggregate(Sum("lbl", alias_name="s"))["s"]
        labels = new_labels
        if prev_sum is not None and cur_sum == prev_sum:
            break  # labels only decrease; equal sum == fixpoint
        prev_sum = cur_sum

    final = labels.to_pandas()
    return set(final.loc[final["nbr"] != final["lbl"], "nbr"].astype(int))


def _keep_after_pairs(docs: "rd.Dataset", pairs: list[tuple[int, int]]) -> "rd.Dataset":
    """Drop every doc whose cluster root isn't itself. Adaptive:
    driver union-find for bounded pair lists, distributed min-label
    propagation past _UNION_FIND_MAX_PAIRS (adversarial dup rates)."""
    if len(pairs) <= _UNION_FIND_MAX_PAIRS:
        roots = _union_find(pairs)
        removed = {d for d, r in roots.items() if r != d}
    else:
        removed = _removed_by_label_propagation(pairs)
    # broadcast a sorted int64 array (np.isin against a Python set
    # silently degrades to an object-scalar comparison)
    removed_arr = np.fromiter(sorted(removed), dtype=np.int64,
                              count=len(removed))
    removed_ref = ray.put(removed_arr)

    def keep(t: pa.Table) -> pa.Table:
        rm = ray.get(removed_ref)
        mask = pa.array(~np.isin(t["doc_id"].to_numpy(), rm))
        return t.select(["doc_id"]).filter(mask)

    return docs.map_batches(keep, batch_format="pyarrow")


def _pairs_bucketed(bucket_rows: "rd.Dataset", group_pair_fn,
                    num_buckets: int = 64) -> list[tuple[int, int]]:
    """band_key rows -> verified-candidate pair list.

    Groups by ``crc32(band_key) % B`` (B map_groups calls total — never
    one per band, since almost every band bucket has exactly one member
    and per-group UDF overhead would dominate). Inside a bucket, bands
    with >= 2 members are found vectorized; ``group_pair_fn(sub)`` emits
    pairs for one colliding band's rows.
    """
    from ..functions.hashing import bucket_ids

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("b", bucket_ids(t["band_key"], num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_key", "doc_id"], kind="mergesort")
        sizes = g.groupby("band_key")["doc_id"].transform("size")
        g = g[sizes > 1]
        a_out, b_out = [], []
        for _, sub in g.groupby("band_key", sort=False):
            for pair in group_pair_fn(sub):
                a_out.append(pair[0])
                b_out.append(pair[1])
        return pd.DataFrame({"a": pd.array(a_out, dtype="int64"),
                             "b": pd.array(b_out, dtype="int64")})

    from .joins import coalesce_blocks

    pairs_df = (
        bucket_rows.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(coalesce_blocks())
        .groupby("b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    if pairs_df.empty:
        return []
    return sorted(set(zip(pairs_df["a"], pairs_df["b"])))


def _all_pairs(sub: pd.DataFrame):
    ids = sorted(set(int(x) for x in sub["doc_id"]))
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            yield ids[i], ids[j]


@ray.remote
def _verify_shard(doc_path: str, shard: list[tuple[int, int]],
                  shingle_fn, threshold: float) -> list[tuple[int, int]]:
    """Verify one shard of candidate pairs: parquet predicate pushdown
    fetches only this shard's colliding docs; shingle sets are built
    once per doc in-task."""
    import pyarrow.parquet as pq

    need = sorted({d for p in shard for d in p})
    tbl = pq.read_table(doc_path, columns=["doc_id", "text"],
                        filters=[("doc_id", "in", need)])
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    shingles = {d: shingle_fn(texts[d]) for d in need}
    return [(a, b) for a, b in shard
            if jaccard(shingles[a], shingles[b]) >= threshold]


def _verify_jaccard(sf_dir: str, pairs: list[tuple[int, int]],
                    shingle_fn, threshold: float,
                    shard_size: int = 4096) -> list[tuple[int, int]]:
    """Exact-verify candidate pairs in PARALLEL Ray tasks (one per
    pair shard). Pairs are sorted before sharding, so a shard's doc set
    is id-clustered and its parquet predicate scan touches few row
    groups; no task (and not the driver) ever holds every colliding
    doc's text."""
    if not pairs:
        return []
    doc_path = os.path.join(sf_dir, "documents.parquet")
    refs = [
        _verify_shard.remote(doc_path, pairs[i:i + shard_size],
                             shingle_fn, threshold)
        for i in range(0, len(pairs), shard_size)
    ]
    out: list[tuple[int, int]] = []
    for chunk in ray.get(refs):
        out.extend(chunk)
    return sorted(out)


# ---------------------------------------------------------------------------

def dedup_minhash(sf_dir: str, threshold: float = 0.8, seed: int = 42) -> "rd.Dataset":
    """MinHash(128) + LSH(16 bands): char-5-shingle near-dup removal.
    Returns the kept doc_ids."""
    docs = _read_docs(sf_dir)

    def sketch(t: pa.Table) -> pa.Table:
        ids, keys = [], []
        for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = minhash_signature(char_shingles(text), _N_PERM, seed)
            for i, bh in enumerate(band_hashes(sig, _BANDS)):
                ids.append(d)
                keys.append(f"{i}:{bh:x}")
        return pa.table({"band_key": pa.array(keys, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    buckets = docs.map_batches(sketch, batch_format="pyarrow", batch_size=2048)
    pairs = _pairs_bucketed(buckets, _all_pairs)
    verified = _verify_jaccard(sf_dir, pairs, char_shingles, threshold)
    return _keep_after_pairs(docs, verified)


def dedup_ngram(sf_dir: str, threshold: float = 0.7, seed: int = 7) -> "rd.Dataset":
    """Word-3-gram Jaccard near-dup removal (MinHash-blocked, exact
    n-gram Jaccard verification). Returns kept doc_ids."""
    docs = _read_docs(sf_dir)

    def sketch(t: pa.Table) -> pa.Table:
        ids, keys = [], []
        for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = minhash_signature(word_ngrams(text), _N_PERM, seed)
            for i, bh in enumerate(band_hashes(sig, _BANDS)):
                ids.append(d)
                keys.append(f"{i}:{bh:x}")
        return pa.table({"band_key": pa.array(keys, pa.string()),
                         "doc_id": pa.array(ids, pa.int64())})

    buckets = docs.map_batches(sketch, batch_format="pyarrow", batch_size=2048)
    pairs = _pairs_bucketed(buckets, _all_pairs)
    verified = _verify_jaccard(sf_dir, pairs, word_ngrams, threshold)
    return _keep_after_pairs(docs, verified)


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> "rd.Dataset":
    """SimHash(64) near-dup removal with band blocking. The band count
    is DERIVED from the verification threshold (bands = max_hamming+1)
    so the pigeonhole recall guarantee — Hamming <= bands-1 implies at
    least one identical band — always matches what verification
    accepts; a fixed band count would silently lose recall for larger
    thresholds. Returns kept doc_ids."""
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    n_bands = max_hamming + 1
    docs = _read_docs(sf_dir)

    def sketch(t: pa.Table) -> pa.Table:
        ids, keys, hashes = [], [], []
        for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            h = simhash64(text)
            for i, band in enumerate(simhash_bands(h, bands=n_bands)):
                ids.append(d)
                keys.append(f"{i}:{band:x}")
                hashes.append(h)
        return pa.table({
            "band_key": pa.array(keys, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(np.array(hashes, dtype=np.uint64).astype(np.int64),
                                pa.int64()),
        })

    buckets = docs.map_batches(sketch, batch_format="pyarrow", batch_size=2048)

    def hamming_pairs(sub: pd.DataFrame):
        rows = sorted(set(zip((int(x) for x in sub["doc_id"]),
                              (int(h) for h in sub["simhash"]))))
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ha = int(np.int64(rows[i][1]).astype(np.uint64))
                hb = int(np.int64(rows[j][1]).astype(np.uint64))
                if rows[i][0] != rows[j][0] and hamming64(ha, hb) <= max_hamming:
                    yield rows[i][0], rows[j][0]

    verified = _pairs_bucketed(buckets, hamming_pairs)
    return _keep_after_pairs(docs, verified)


def neardup_embedding(sf_dir: str, threshold: float = 0.95,
                      n_bands: int = 4, planes_per_band: int = 8,
                      seed: int = 13) -> "rd.Dataset":
    """Embedding-cosine near-dup removal: MULTI-BAND random-hyperplane
    LSH (each doc lands in ``n_bands`` independent buckets — a pair at
    angle theta collides in at least one band with probability
    1-(1-(1-theta/pi)^planes)^bands, vs a single band's
    (1-theta/pi)^planes; at cos=0.95 that's ~0.89 recall for 4x8 vs
    ~0.28 for one 12-plane band), exact cosine verification within
    buckets (false positives cost verification only, never
    correctness). Returns kept vec_ids (column name doc_id for
    uniformity)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])

    # probe dim from one row, then broadcast the per-band plane stacks
    first = ds.take(1)[0]["embedding"]
    dim = len(first)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands, dim, planes_per_band))
    planes_ref = ray.put(planes)
    weights = (1 << np.arange(planes_per_band)).astype(np.int64)

    def bucketize(t: pa.Table) -> pa.Table:
        from ..functions.vectors import list_column_to_matrix

        P = ray.get(planes_ref)
        M = list_column_to_matrix(t["embedding"])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        ids = t["vec_id"].to_numpy()
        key_parts, id_parts, vec_parts = [], [], []
        for band in range(P.shape[0]):
            bits = (M @ P[band]) > 0
            codes = bits.astype(np.int64) @ weights
            key_parts.extend(f"{band}:{c:x}" for c in codes)
            id_parts.append(ids)
            vec_parts.append(M)
        out = pa.table({
            "band_key": pa.array(key_parts, pa.string()),
            "doc_id": pa.array(np.concatenate(id_parts), pa.int64()),
            "vec": pa.array(np.concatenate(vec_parts, axis=0).tolist(),
                            pa.list_(pa.float64())),
        })
        return out

    buckets = ds.map_batches(bucketize, batch_format="pyarrow", batch_size=8192)

    def cosine_pairs(sub: pd.DataFrame):
        ids = np.array(sub["doc_id"], dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        M = np.array([np.asarray(v) for v in sub["vec"].to_numpy()[order]])
        sims = M @ M.T
        iu = np.triu_indices(len(ids), k=1)
        hits = sims[iu] >= threshold
        for i, j, h in zip(iu[0], iu[1], hits):
            if h and ids[i] != ids[j]:
                yield int(ids[i]), int(ids[j])

    verified = _pairs_bucketed(buckets, cosine_pairs)
    keep_docs = ds.map_batches(
        lambda t: pa.table({"doc_id": pa.array(t["vec_id"].to_pylist(), pa.int64())}),
        batch_format="pyarrow",
    )
    return _keep_after_pairs(keep_docs, verified)
