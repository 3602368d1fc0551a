"""Deterministic text->embedding stage (functions/embed.py,
stages/embed.py): vectorized-kernel parity vs a straightforward
per-document reference, determinism, similarity ordering, and the full
text -> embed -> LSH -> verified-near-dup chain on planted pairs."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

BASE = (
    "The quick brown fox jumps over the lazy dog while the rain in "
    "spain falls mainly on the plain and every good boy deserves "
    "fudge because the five boxing wizards jump quickly tonight."
)
OTHER = (
    "Completely different content about distributed dataflow engines "
    "streaming arrow batches through actor pools with salted hash "
    "partitioning and per-partition lineage checkpoints for resume."
)


def _splitmix64(x: int) -> int:
    mask = (1 << 64) - 1
    x = (x + 0x9E3779B97F4A7C15) & mask
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
    return x ^ (x >> 31)


class TestHashedNgramEmbed:
    """Kernel parity: the vectorized numpy scatter vs a pure-Python
    per-document reference (independent splitmix implementation)."""

    @staticmethod
    def _reference(texts, dim, seed):
        seed_mix = _splitmix64(seed)
        out = np.zeros((len(texts), dim), dtype=np.int64)
        for r, t in enumerate(texts):
            b = t.encode("utf-8") if t else b""
            for i in range(len(b) - 2):
                code = b[i] | (b[i + 1] << 8) | (b[i + 2] << 16)
                h = _splitmix64(code ^ seed_mix)
                out[r, h % dim] += 1 if (h >> 32) & 1 else -1
        M = out.astype(np.float64)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return (M / norms).astype(np.float32)

    def test_matches_reference(self):
        from mistralocr_pdf2md_translator_ray.functions.embed import (
            hashed_ngram_matrix,
        )

        texts = [BASE, OTHER, "", None, "ab", "abc", "héllo wörld",
                 BASE * 3, "\x00\x01\x02\x03 binaryish"]
        got = hashed_ngram_matrix(texts, dim=32, seed=7)
        exp = self._reference(texts, dim=32, seed=7)
        np.testing.assert_array_equal(got, exp)
        # empty / too-short rows are exactly zero
        assert not got[2].any() and not got[3].any() and not got[4].any()

    def test_deterministic_and_seed_sensitive(self):
        from mistralocr_pdf2md_translator_ray.functions.embed import (
            hashed_ngram_matrix,
        )

        a = hashed_ngram_matrix([BASE, OTHER], dim=64, seed=0)
        b = hashed_ngram_matrix([BASE, OTHER], dim=64, seed=0)
        np.testing.assert_array_equal(a, b)
        c = hashed_ngram_matrix([BASE, OTHER], dim=64, seed=1)
        assert (a != c).any()

    def test_similarity_ordering(self):
        from mistralocr_pdf2md_translator_ray.functions.embed import (
            hashed_ngram_matrix,
        )

        near = BASE.replace("lazy dog", "sleepy dog")
        M = hashed_ngram_matrix([BASE, near, OTHER], dim=64, seed=0)
        cos_near = float(M[0] @ M[1])
        cos_far = float(M[0] @ M[2])
        assert cos_near > 0.9 > cos_far


class TestEmbedStage:
    @pytest.fixture()
    def corpus(self, tmp_path):
        near = BASE.replace("lazy dog", "sleepy dog")
        d = tmp_path / "corpus"
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([BASE, near, OTHER, "short text"], pa.string()),
        }), str(d / "documents.parquet"))
        return str(d)

    def test_embed_documents_schema_and_values(self, corpus, ray_session):
        from mistralocr_pdf2md_translator_ray.functions.embed import (
            hashed_ngram_matrix,
        )
        from mistralocr_pdf2md_translator_ray.stages.embed import (
            embed_documents,
        )

        out = embed_documents(corpus, dim=16, seed=3).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        assert out["vec_id"].tolist() == [0, 1, 2, 3]
        M = np.stack(out["embedding"].to_numpy())
        assert M.shape == (4, 16) and M.dtype == np.float32
        src = pq.read_table(os.path.join(corpus, "documents.parquet"))
        exp = hashed_ngram_matrix(src["text"].to_pylist(), 16, 3)
        np.testing.assert_array_equal(M, exp)

    def test_full_chain_text_to_neardup(self, corpus, tmp_path,
                                        ray_session):
        """text -> embed_corpus -> neardup_embedding: the planted near
        pair (0, 1) collapses to one survivor, distinct docs survive."""
        from mistralocr_pdf2md_translator_ray.stages.dedup import (
            neardup_embedding,
        )
        from mistralocr_pdf2md_translator_ray.stages.embed import embed_corpus

        emb_dir = str(tmp_path / "emb")
        os.makedirs(emb_dir)
        embed_corpus(corpus, emb_dir, dim=64, seed=0)
        kept = sorted(r["doc_id"] for r in
                      neardup_embedding(emb_dir, threshold=0.9).take_all())
        assert 0 in kept and 1 not in kept
        assert 2 in kept and 3 in kept

    def test_curate_embed_stage(self, corpus, tmp_path, ray_session):
        from mistralocr_pdf2md_translator_ray.pipelines.curate import (
            curate_corpus,
        )

        out = str(tmp_path / "curated")
        manifest = curate_corpus(corpus, out, embed_dim=16)
        assert manifest["embed"] == manifest["order"]
        emb = rd.read_parquet(
            os.path.join(out, "embed", "embeddings.parquet")).to_pandas()
        # part_id is the hive resume-partition column of the
        # checkpointed stage layout; consumers read (vec_id, embedding)
        assert {"vec_id", "embedding"} <= set(emb.columns)
        assert set(emb.columns) <= {"vec_id", "embedding", "part_id"}
        assert len(emb) == manifest["order"]
