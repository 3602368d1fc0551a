"""Property-based kernel tests (no Ray): invariants that must hold for
arbitrary inputs, not just fixtures."""

from hypothesis import given, settings, strategies as st

from mistralocr_pdf2md_translator_ray.functions import (
    extract_turn,
    html_to_markdown,
    normalize_markdown,
    process_turn,
    splice_children,
    token_count,
)
from mistralocr_pdf2md_translator_ray.functions.dedup import (
    char_shingles,
    jaccard,
    minhash_signature,
)

text_st = st.text(max_size=800)


class TestNormalizeProperties:
    @given(text_st)
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, s):
        once = normalize_markdown(s)
        assert normalize_markdown(once) == once

    @given(text_st)
    @settings(max_examples=200, deadline=None)
    def test_never_raises_and_no_trailing_blank(self, s):
        out = normalize_markdown(s)
        assert not out.endswith("\n")
        assert not out.startswith("\n")


class TestExtractProperties:
    @given(text_st, st.sampled_from(["", "markdown", "html", "pdf_layout", "junk"]))
    @settings(max_examples=150, deadline=None)
    def test_error_as_value_never_raises(self, s, tool):
        md, status, err = process_turn(s, tool)
        assert status in ("ok", "error")
        assert (status == "error") == bool(err)
        if status == "error":
            assert md.startswith("--- ERROR:")

    @given(text_st)
    @settings(max_examples=100, deadline=None)
    def test_html_extract_total(self, s):
        # stdlib parser is lenient: any string must extract without raising
        out = html_to_markdown(s)
        assert isinstance(out, str)


class TestSpliceProperties:
    @given(st.lists(st.from_regex(r"[a-z]{1,8}-[0-9]{1,3}", fullmatch=True),
                    max_size=5, unique=True))
    @settings(max_examples=100, deadline=None)
    def test_splice_only_touches_matched(self, ids):
        md = "\n\n".join(f"![{i}]({i})" for i in ids) + "\n\nplain tail"
        children = {i: '{"v": 1}' for i in ids[::2]}  # every other id
        out = splice_children(md, children)
        for i in ids:
            assert f"![{i}]({i})" in out  # placeholder always preserved
        assert out.count("```json") == len(children)
        assert "plain tail" in out


class TestTokenCountProperties:
    @given(text_st)
    @settings(max_examples=200, deadline=None)
    def test_matches_split_semantics(self, s):
        assert token_count(s) == len(s.split())


class TestLayoutProperties:
    @given(st.lists(
        st.tuples(st.integers(0, 1),            # column
                  st.integers(0, 40),           # line number
                  st.text(alphabet="abcdef ", min_size=1, max_size=12)),
        min_size=1, max_size=30, unique_by=lambda t: (t[0], t[1])),
        st.randoms())
    @settings(max_examples=60, deadline=None)
    def test_span_order_invariance(self, spans, rnd):
        """Reading order is computed from coordinates, never inherited
        from input span order."""
        import json

        from mistralocr_pdf2md_translator_ray.functions import layout_to_markdown

        def build(span_list):
            return json.dumps({"pages": [{"w": 612, "h": 792, "spans": [
                {"x": 50 + 300 * col, "y": 60 + 14 * line, "w": 200, "h": 12,
                 "text": text}
                for col, line, text in span_list
            ]}]})

        base = layout_to_markdown(build(spans))
        shuffled = list(spans)
        rnd.shuffle(shuffled)
        assert layout_to_markdown(build(shuffled)) == base


class TestSimhashBandProperties:
    @given(st.integers(min_value=0, max_value=(1 << 64) - 1),
           st.integers(min_value=0, max_value=7),
           st.data())
    @settings(max_examples=200, deadline=None)
    def test_pigeonhole_guarantee(self, h, n_flips, data):
        """For ANY hash and any <= max_hamming bit flips, blocking with
        bands = max_hamming+1 must put the pair in at least one common
        band — the recall guarantee dedup_simhash relies on."""
        from mistralocr_pdf2md_translator_ray.functions.dedup import simhash_bands

        flip_bits = data.draw(st.lists(st.integers(0, 63), min_size=n_flips,
                                       max_size=n_flips, unique=True))
        h2 = h
        for b in flip_bits:
            h2 ^= 1 << b
        bands = n_flips + 1
        assert any(x == y for x, y in zip(simhash_bands(h, bands),
                                          simhash_bands(h2, bands)))


class TestUnionFindProperties:
    @given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                    max_size=80))
    @settings(max_examples=100, deadline=None)
    def test_roots_match_bfs_components(self, pairs):
        """Union-find min-label roots == BFS connected components'
        min element, for arbitrary edge lists (self-loops included)."""
        from mistralocr_pdf2md_translator_ray.stages.dedup import _union_find

        roots = _union_find(pairs)
        # reference: BFS over the undirected graph
        adj: dict[int, set[int]] = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        seen: set[int] = set()
        for start in adj:
            if start in seen:
                continue
            comp, frontier = {start}, [start]
            while frontier:
                x = frontier.pop()
                for y in adj[x]:
                    if y not in comp:
                        comp.add(y)
                        frontier.append(y)
            seen |= comp
            lo = min(comp)
            for x in comp:
                assert roots[x] == lo


class TestMinHashProperties:
    @given(st.text(min_size=30, max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_identical_texts_identical_signatures(self, s):
        a = minhash_signature(char_shingles(s))
        b = minhash_signature(char_shingles(s))
        assert (a == b).all()
        assert jaccard(char_shingles(s), char_shingles(s)) == 1.0

    @given(st.text(min_size=50, max_size=200, alphabet="abcdefgh "),
           st.text(min_size=50, max_size=200, alphabet="stuvwxyz "))
    @settings(max_examples=50, deadline=None)
    def test_disjoint_alphabets_low_estimate(self, a, b):
        sa, sb = char_shingles(a), char_shingles(b)
        sim = (minhash_signature(sa) == minhash_signature(sb)).mean()
        assert sim <= 0.35  # disjoint shingle sets -> low collision rate
