"""Staged curation job: end-to-end composition, stage-granular resume,
and determinism of the final ordered corpus."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from mistralocr_pdf2md_translator_ray.pipelines.curate import curate_corpus

SF = "/root/testdata/sf0.001"


def _read_docs_dir(d):
    return pq.read_table(os.path.join(d, "documents.parquet")).to_pandas()


class TestCurateCorpus:
    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory, ray_session):
        out = str(tmp_path_factory.mktemp("curate"))
        manifest = curate_corpus(SF, out, span_tokens=8)
        return out, manifest

    def test_stage_outputs_and_monotone_counts(self, run):
        out, m = run
        for stage in ("scrub", "dedup", "spans", "order"):
            assert os.path.exists(os.path.join(out, stage, "_SUCCESS"))
        src_rows = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
        assert m["scrub"] == src_rows              # scrub rewrites, never drops
        assert m["dedup"] <= m["scrub"]            # near-dup removal shrinks
        assert m["spans"] == m["dedup"]            # span dedup keeps every doc
        assert m["order"] == m["spans"]
        assert m["sequences"] >= 1

    def test_dedup_stage_matches_standalone(self, run):
        from mistralocr_pdf2md_translator_ray.stages.dedup import dedup_minhash

        out, m = run
        kept = sorted(
            r["doc_id"]
            for r in dedup_minhash(os.path.join(out, "scrub")).take_all())
        got = sorted(_read_docs_dir(os.path.join(out, "dedup"))["doc_id"])
        assert got == kept

    def test_span_stage_matches_standalone(self, run):
        from mistralocr_pdf2md_translator_ray.stages.dedup import dedup_spans

        out, m = run
        exp = dedup_spans(os.path.join(out, "dedup"), span_tokens=8) \
            .to_pandas().set_index("doc_id")["text_deduped"]
        got = _read_docs_dir(os.path.join(out, "spans")).set_index("doc_id")
        assert len(got) == len(exp)
        assert (got["text"] == exp.reindex(got.index)).all()

    def test_resume_skips_completed_stages(self, run):
        import shutil

        out, m = run
        # record stage-1 output mtimes, delete the LAST stage only
        d1 = os.path.join(out, "scrub", "documents.parquet")
        before = {f: os.path.getmtime(os.path.join(d1, f))
                  for f in os.listdir(d1)}
        shutil.rmtree(os.path.join(out, "order"))
        m2 = curate_corpus(SF, out, span_tokens=8)
        assert m2 == m
        after = {f: os.path.getmtime(os.path.join(d1, f))
                 for f in os.listdir(d1)}
        assert after == before  # earlier stages untouched byte-for-byte

    def test_crash_healing_clears_partial_stage(self, run):
        """A stage dir WITHOUT _SUCCESS (mid-write crash) may hold
        stale files; the rerun must clear them so footer counts can't
        mix old and new writes."""
        import os as _os
        import shutil

        out, m = run
        d4 = _os.path.join(out, "order")
        _os.remove(_os.path.join(d4, "_SUCCESS"))  # simulate crash
        stray = _os.path.join(d4, "documents.parquet", "zz_stale.parquet")
        target = _os.path.join(out, "spans", "documents.parquet")
        src = next(
            _os.path.join(r, f) for r, _, fs in _os.walk(target)
            for f in fs if f.endswith(".parquet"))
        shutil.copy(src, stray)
        m2 = curate_corpus(SF, out, span_tokens=8)
        assert m2 == m                      # counts unchanged
        assert not _os.path.exists(stray)   # stale file purged

    def test_partition_granular_resume_within_stage(self, run):
        """Kill-mid-stage semantics: wipe ONE partition's lineage entry
        + data from the scrub stage; resume must recompute only that
        partition — every other partition's files stay byte-untouched
        (mtimes unchanged) — and restore identical content."""
        import json
        import shutil

        out, m = run
        d1 = os.path.join(out, "scrub")
        data = os.path.join(d1, "documents.parquet")
        before = pq.read_table(data).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)

        # simulate a crash that lost partition 3 mid-stage
        victim = 3
        lineage_path = os.path.join(d1, "_lineage.json")
        lineage = json.load(open(lineage_path))
        assert str(victim) in lineage
        victim_entry = lineage[str(victim)]
        del lineage[str(victim)]
        json.dump(lineage, open(lineage_path, "w"))
        shutil.rmtree(os.path.join(data, f"part_id={victim}"))
        os.remove(os.path.join(d1, "_SUCCESS"))

        untouched = {
            os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
            for r, _, fs in os.walk(data) for f in fs}

        m2 = curate_corpus(SF, out, span_tokens=8)
        assert m2 == m

        # survivors never rewritten
        for path, mtime in untouched.items():
            assert os.path.getmtime(path) == mtime, path
        # victim partition restored with identical content
        after = pq.read_table(data).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(before, after)
        # and its lineage entry is back, matching the original readback
        lineage2 = json.load(open(lineage_path))
        assert (lineage2[str(victim)]["content_hash"]
                == victim_entry["content_hash"])

    def test_final_order_deterministic(self, run, tmp_path):
        out, m = run
        a = pq.read_table(os.path.join(out, "order", "documents.parquet")) \
            .to_pandas()
        out2 = str(tmp_path / "again")
        curate_corpus(SF, out2, span_tokens=8)
        b = pq.read_table(os.path.join(out2, "order", "documents.parquet")) \
            .to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("shuffle_key").reset_index(drop=True),
            b.sort_values("shuffle_key").reset_index(drop=True))
