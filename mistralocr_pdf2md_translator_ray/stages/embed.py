"""Text -> embedding stage: the embeddings.parquet PRODUCER.

The similarity / embedding-near-dup / k-means family consumes a
provided embeddings table; this stage generates one deterministically
from raw document text (feature-hashed byte-3-gram projection,
functions/embed.py), closing the end-to-end text -> embed -> LSH -> ANN
chain. Actor-pool map_batches with the projection config in
``__init__`` (the ST1-ST3 pattern); only (vec_id, embedding) rows leave
the stage — fixed ``4 + 4*dim`` bytes per doc regardless of text size.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.embed import hashed_ngram_matrix


class HashedNgramEmbedder:
    """documents (doc_id, text) -> (vec_id, embedding list<float32>[dim]).

    vec_id = doc_id: the embeddings table joins back to documents by
    construction (the same contract the synthetic testdata tables use).
    """

    def __init__(self, dim: int = 64, seed: int = 0) -> None:
        self._dim = int(dim)
        self._seed = int(seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        M = hashed_ngram_matrix(t["text"].to_pylist(), self._dim,
                                self._seed)
        return pa.table({
            "vec_id": t["doc_id"].cast(pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(M.ravel(), pa.float32()), self._dim),
        })


def embed_documents(sf_dir: str, dim: int = 64,
                    seed: int = 0) -> "rd.Dataset":
    """documents.parquet -> streaming (vec_id, embedding) Dataset."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    return ds.map_batches(
        HashedNgramEmbedder,
        fn_constructor_kwargs={"dim": dim, "seed": seed},
        batch_format="pyarrow",
        batch_size=2048,
        # cap (1, 4): actor pools must leave >=1/4 of CPUs for the
        # task stages (write/read) or small sessions livelock
        concurrency=(1, 4),
        num_cpus=1,
    )


def embed_corpus(sf_dir: str, out_dir: str, dim: int = 64,
                 seed: int = 0) -> str:
    """Materialize the embedding table to
    ``<out_dir>/embeddings.parquet`` (a parquet DIRECTORY — the same
    layout curate stages use) and return ``out_dir``, which then serves
    as the ``sf_dir`` of every embedding consumer (knn_cosine,
    neardup_embedding, build_ivf_index...)."""
    dest = os.path.join(out_dir, "embeddings.parquet")
    os.makedirs(dest, exist_ok=True)
    embed_documents(sf_dir, dim, seed).write_parquet(dest)
    return out_dir
