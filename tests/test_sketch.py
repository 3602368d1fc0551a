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
