"""HLL sketch: kernel error bound + pipeline estimate vs exact."""

import numpy as np


class TestHLLKernel:
    def test_error_bound_various_cardinalities(self):
        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            hash64,
            hll_estimate,
            hll_merge,
            hll_partial,
        )

        rng = np.random.default_rng(0)
        for n in (100, 5_000, 200_000):
            vals = rng.choice(np.arange(n * 3, dtype=np.int64), size=n,
                              replace=False)
            # split into chunks and merge partials (mergeability)
            reg = None
            for chunk in np.array_split(hash64(vals), 7):
                part = hll_partial(chunk)
                reg = part if reg is None else hll_merge(reg, part)
            est = hll_estimate(reg)
            assert abs(est - n) / n < 0.05, (n, est)

    def test_merge_commutes(self):
        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            hash64,
            hll_merge,
            hll_partial,
        )

        a = hll_partial(hash64(np.arange(1000, dtype=np.int64)))
        b = hll_partial(hash64(np.arange(500, 1500, dtype=np.int64)))
        assert (hll_merge(a, b) == hll_merge(b, a)).all()


class TestHLLPipeline:
    def test_estimate_close_to_exact(self, ray_session):
        import duckdb

        from mistralocr_pdf2md_translator_ray.pipelines.library import (
            approx_distinct_users,
        )

        sf = "/root/testdata/sf0.001"
        est = approx_distinct_users(sf).to_pandas()["approx_distinct_users"][0]
        exact = duckdb.sql(
            f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
        ).fetchone()[0]
        assert abs(est - exact) / exact < 0.05, (est, exact)


class TestBloom:
    def test_no_false_negatives_property(self):
        import numpy as np

        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            bloom_contains,
            bloom_merge,
            bloom_partial,
        )

        rng = np.random.default_rng(5)
        keys = rng.integers(0, 1 << 62, size=20000, dtype=np.int64)
        half = len(keys) // 2
        bm = bloom_merge(bloom_partial(keys[:half]), bloom_partial(keys[half:]))
        assert bloom_contains(bm, keys).all()  # NEVER a false negative

    def test_false_positive_rate_bounded(self):
        import numpy as np

        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            bloom_contains,
            bloom_partial,
        )

        rng = np.random.default_rng(9)
        members = rng.integers(0, 1 << 62, size=100_000, dtype=np.int64)
        bm = bloom_partial(members)
        probes = rng.integers(0, 1 << 62, size=50_000, dtype=np.int64)
        outside = probes[~np.isin(probes, members)]
        fp = bloom_contains(bm, outside).mean()
        assert fp < 0.01, fp  # 2MiB/k=7 at 100k keys: expect ~0


class TestTDigest:
    def test_rank_error_bounded_across_distributions(self):
        import numpy as np

        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            tdigest_build,
            tdigest_merge,
            tdigest_quantile,
        )

        rng = np.random.default_rng(17)
        dists = {
            "uniform": rng.uniform(0, 1000, 400_000),
            "lognormal": rng.lognormal(3, 2, 400_000),
            "bimodal": np.concatenate([rng.normal(10, 1, 200_000),
                                       rng.normal(500, 30, 200_000)]),
        }
        for name, vals in dists.items():
            # build from 64k-value batches, tree-merge (the pipeline shape)
            digests = [tdigest_build(vals[i:i + 65536])
                       for i in range(0, len(vals), 65536)]
            d = digests[0]
            for nxt in digests[1:]:
                d = tdigest_merge(d, nxt)
            srt = np.sort(vals)
            for q in (0.01, 0.25, 0.5, 0.9, 0.99):
                est = tdigest_quantile(d, q)
                # measure RANK error: where does the estimate land?
                rank = np.searchsorted(srt, est) / len(srt)
                assert abs(rank - q) < 0.01, (name, q, rank)

    def test_merge_associativity_tolerance(self):
        import numpy as np

        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            tdigest_build,
            tdigest_merge,
            tdigest_quantile,
        )

        rng = np.random.default_rng(3)
        a, b, c = (rng.normal(0, 1, 50_000) for _ in range(3))
        d1 = tdigest_merge(tdigest_merge(tdigest_build(a), tdigest_build(b)),
                           tdigest_build(c))
        d2 = tdigest_merge(tdigest_build(a),
                           tdigest_merge(tdigest_build(b), tdigest_build(c)))
        for q in (0.1, 0.5, 0.9):
            assert abs(tdigest_quantile(d1, q) - tdigest_quantile(d2, q)) < 0.05

    def test_digest_size_bounded(self):
        import numpy as np

        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            TDIGEST_DELTA,
            tdigest_build,
        )

        means, weights = tdigest_build(np.random.default_rng(0).uniform(0, 1, 300_000))
        assert len(means) <= 2 * TDIGEST_DELTA  # bounded regardless of n


class TestApproxValueQuantiles:
    def test_pipeline_close_to_exact(self, ray_session):
        """The distributed t-digest query's p50 must land within 1%
        RANK of the exact grouped median on real testdata."""
        import duckdb

        from mistralocr_pdf2md_translator_ray.pipelines.library import (
            approx_value_quantiles,
        )

        sf = "/root/testdata/sf0.001"
        got = approx_value_quantiles(sf).to_pandas().set_index("event_type")
        con = duckdb.connect()
        exact = con.sql(
            f"SELECT event_type, quantile_disc(value, 0.5) AS p50, "
            f"count(*) AS n FROM '{sf}/events.parquet' GROUP BY event_type"
        ).df().set_index("event_type")
        for et in exact.index:
            est = got.loc[et, "p50"]
            # rank of the estimate among the type's true values
            rank = con.sql(
                f"SELECT CAST(sum(CASE WHEN value <= {est} THEN 1 ELSE 0 END) "
                f"AS DOUBLE) / count(*) FROM '{sf}/events.parquet' "
                f"WHERE event_type = '{et}'"
            ).fetchone()[0]
            assert abs(rank - 0.5) < 0.02, (et, est, rank)


class TestMisraGries:
    def _true_counts(self, vals):
        uk, cnt = np.unique(vals, return_counts=True)
        return dict(zip(uk.tolist(), cnt.tolist()))

    def test_exact_when_under_capacity(self):
        from mistralocr_pdf2md_translator_ray.functions.sketch import mg_build

        keys = np.arange(100, dtype=np.int64)
        counts = np.arange(1, 101, dtype=np.int64)
        k, c, err = mg_build(keys, counts, m=256)
        assert err == 0
        assert dict(zip(k.tolist(), c.tolist())) == \
               dict(zip(keys.tolist(), counts.tolist()))

    def test_merged_bound_and_guaranteed_recall(self):
        """Batched build + arbitrary merge tree: every estimate
        undercounts by at most the accumulated err, err <= n/(m+1),
        and every key with true count > err is present — the Mergeable
        Summaries guarantee."""
        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            mg_build,
            mg_merge,
        )

        rng = np.random.default_rng(11)
        m = 64
        # heavy keys + a long uniform tail
        heavy = np.repeat(np.arange(5, dtype=np.int64), 4000)
        tail = rng.integers(1000, 200000, size=60_000).astype(np.int64)
        vals = np.concatenate([heavy, tail])
        rng.shuffle(vals)
        n = len(vals)
        true = self._true_counts(vals)

        summaries = []
        for chunk in np.array_split(vals, 13):
            uk, cnt = np.unique(chunk, return_counts=True)
            summaries.append(mg_build(uk, cnt.astype(np.int64), m))
        # lopsided merge order (fold) then a balanced pair merge
        acc = summaries[0]
        for s in summaries[1:7]:
            acc = mg_merge(acc, s, m)
        acc2 = summaries[7]
        for s in summaries[8:]:
            acc2 = mg_merge(acc2, s, m)
        ks, cs, err = mg_merge(acc, acc2, m)

        assert err <= n // (m + 1) + 1
        est = dict(zip(ks.tolist(), cs.tolist()))
        for k, e in est.items():
            assert e <= true[k] <= e + err, (k, e, true[k], err)
        for k, t in true.items():
            if t > err:
                assert k in est, (k, t, err)

    def test_query_finds_planted_heavy_users(self, tmp_path, ray_session):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from mistralocr_pdf2md_translator_ray.pipelines.library import (
            approx_top_users,
        )

        rng = np.random.default_rng(3)
        heavy = np.repeat(np.array([7, 13, 42], dtype=np.int64), 5000)
        tail = rng.integers(100, 50_000, size=40_000).astype(np.int64)
        users = np.concatenate([heavy, tail])
        rng.shuffle(users)
        d = tmp_path / "mg"
        d.mkdir()
        pq.write_table(pa.table({"user_id": pa.array(users, pa.int64())}),
                       str(d / "events.parquet"), row_group_size=8192)

        df = approx_top_users(str(d), k=5, m=256).to_pandas()
        top3 = set(df["user_id"].iloc[:3])
        assert top3 == {7, 13, 42}
        err = int(df["max_err"].iloc[0])
        assert err <= len(users) // 257 + 1
        for _, row in df.iloc[:3].iterrows():
            assert row["est_count"] <= 5000 <= row["est_count"] + err


class TestCountMin:
    def test_linearity_exact(self):
        """CMS is a linear sketch: partial(a) + partial(b) must equal
        partial(concat) CELL-FOR-CELL, which is what makes any merge
        tree order-independent."""
        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            cms_merge,
            cms_partial,
        )

        rng = np.random.default_rng(3)
        a = rng.integers(0, 10_000, 5000).astype(np.int64)
        b = rng.integers(0, 10_000, 7000).astype(np.int64)
        merged = cms_merge(cms_partial(a), cms_partial(b))
        assert (merged == cms_partial(np.concatenate([a, b]))).all()

    def test_no_undercount_and_eps_bound(self):
        """est >= true always; overcount <= (e/w)*N for every probed
        key (the per-key bound holds w.h.p.; fixed seed keeps the test
        deterministic — margin not needed at this N/w)."""
        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            CMS_W,
            cms_merge,
            cms_partial,
            cms_query,
        )

        rng = np.random.default_rng(7)
        vals = rng.zipf(1.3, 120_000).astype(np.int64)
        tbl = None
        for chunk in np.array_split(vals, 9):
            part = cms_partial(chunk)
            tbl = part if tbl is None else cms_merge(tbl, part)
        uk, cnt = np.unique(vals, return_counts=True)
        probe = uk[:3000]
        est = cms_query(tbl, probe)
        true = cnt[:3000]
        assert (est >= true).all()
        eps_n = np.e / CMS_W * len(vals)
        assert (est - true).max() <= eps_n, (int((est - true).max()), eps_n)

    def test_weighted_counts_and_empty(self):
        from mistralocr_pdf2md_translator_ray.functions.sketch import (
            cms_partial,
            cms_query,
        )

        keys = np.array([5, 9], np.int64)
        tbl = cms_partial(keys, np.array([100, 7], np.int64))
        est = cms_query(tbl, keys)
        assert est[0] >= 100 and est[1] >= 7
        assert cms_partial(np.array([], np.int64)).sum() == 0
        assert cms_query(tbl, np.array([], np.int64)).tolist() == []

    def test_pipeline_sandwich_vs_exact(self, ray_session):
        """approx_user_counts_cms: for every returned key,
        lower_count (MG, never overcounts) <= true <= est_count (CMS,
        never undercounts); keys are the true heavy hitters up to the
        MG error bound."""
        import pandas as pd

        from mistralocr_pdf2md_translator_ray.pipelines.library import (
            approx_user_counts_cms,
        )

        sf = "/root/testdata/sf0.001"
        got = approx_user_counts_cms(sf, k=10).to_pandas()
        ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
        true = ev["user_id"].value_counts()
        assert len(got) == 10
        for _, r in got.iterrows():
            t = int(true.get(r["user_id"], 0))
            assert r["lower_count"] <= t <= r["est_count"], dict(r)
