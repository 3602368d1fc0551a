"""Unit tests for the pure extraction kernels (no Ray needed)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from mistralocr_pdf2md_translator_ray.functions import (
    extract_child_payload,
    extract_turn,
    fingerprint64,
    html_to_markdown,
    join_pages,
    lang_id,
    layout_to_markdown,
    normalize_markdown,
    pretty_json,
    process_turn,
    quality_score,
    sanitize_id,
    splice_children,
    strip_json_fences,
    token_count,
)


class TestHtmlExtract:
    def test_boilerplate_dropped(self):
        html = (
            "<body><nav><a href='/a'>home</a> <a href='/b'>about</a></nav>"
            "<article><h1>Title</h1>"
            "<p>This paragraph is clearly long enough to be kept by the scorer.</p>"
            "</article>"
            "<footer><p>copyright links and more links</p></footer></body>"
        )
        md = html_to_markdown(html)
        assert "# Title" in md
        assert "long enough to be kept" in md
        assert "home" not in md
        assert "copyright" not in md

    def test_link_farm_dropped(self):
        html = (
            "<div><p><a href='/x'>click here</a> <a href='/y'>buy now</a> ok</p>"
            "<p>Real content sentence that is long enough to stay in the output.</p></div>"
        )
        md = html_to_markdown(html)
        assert "click here" not in md
        assert "Real content" in md

    def test_list_and_blockquote(self):
        html = (
            "<ul><li>First item with enough text to matter here</li>"
            "<li>Second item also has plenty of text in it</li></ul>"
            "<blockquote>A quoted sentence that should be preserved fine.</blockquote>"
        )
        md = html_to_markdown(html)
        assert md.count("- ") == 2
        assert "> A quoted sentence" in md

    def test_pre_block(self):
        md = html_to_markdown("<pre>x = 1\ny = 2</pre>")
        assert md == "```\nx = 1\ny = 2\n```"

    def test_table_rows(self):
        html = (
            "<table><tr><th>colA</th><th>colB</th></tr>"
            "<tr><td>1</td><td>2</td></tr></table>"
        )
        md = html_to_markdown(html)
        assert "| colA | colB |" in md
        assert "| 1 | 2 |" in md

    def test_empty_and_malformed(self):
        assert html_to_markdown("") == ""
        assert html_to_markdown("   ") == ""
        # malformed nesting must not raise
        html_to_markdown("<p>Unclosed <b>bold <p>another paragraph long enough to keep")

    def test_unicode(self):
        md = html_to_markdown("<article><p>数据流批处理合并排序洗牌表行列键值联接过滤分组窗口</p></article>")
        assert "数据流" in md


class TestLayout:
    def test_single_column_reading_order(self):
        doc = {"pages": [{"w": 612, "h": 792, "spans": [
            {"x": 50, "y": 74, "w": 500, "h": 12, "text": "second line"},
            {"x": 50, "y": 60, "w": 500, "h": 12, "text": "first line"},
        ]}]}
        assert layout_to_markdown(json.dumps(doc)) == "first line\nsecond line"

    def test_two_columns_left_then_right(self):
        spans = []
        for i in range(3):
            spans.append({"x": 50, "y": 60 + 14 * i, "w": 200, "h": 12, "text": f"L{i}"})
            spans.append({"x": 330, "y": 60 + 14 * i, "w": 200, "h": 12, "text": f"R{i}"})
        out = layout_to_markdown(json.dumps({"pages": [{"spans": spans}]}))
        assert out.index("L2") < out.index("R0")

    def test_paragraph_gap(self):
        doc = {"pages": [{"spans": [
            {"x": 50, "y": 60, "w": 500, "h": 12, "text": "para one"},
            {"x": 50, "y": 120, "w": 500, "h": 12, "text": "para two"},
        ]}]}
        assert layout_to_markdown(json.dumps(doc)) == "para one\n\npara two"

    def test_same_line_merge_x_order(self):
        doc = {"pages": [{"spans": [
            {"x": 200, "y": 60, "w": 100, "h": 12, "text": "world"},
            {"x": 50, "y": 61, "w": 100, "h": 12, "text": "hello"},
        ]}]}
        assert layout_to_markdown(json.dumps(doc)) == "hello world"

    def test_malformed_raises_value_error(self):
        import pytest

        with pytest.raises(ValueError):
            layout_to_markdown('{"pages": [')
        with pytest.raises(ValueError):
            layout_to_markdown('{"nope": 1}')


def _layout_to_markdown_ref(payload):
    """Straightforward dict-based reference for the tuple-converted
    layout kernel (the pre-optimization implementation, kept verbatim
    for the differential)."""
    from mistralocr_pdf2md_translator_ray.functions.layout import (
        COLUMN_GAP,
        LINE_TOL,
        MIN_COLUMN_SPANS,
        PARA_GAP,
    )

    def split_columns(spans):
        if len(spans) < 2 * MIN_COLUMN_SPANS:
            return [spans]
        iv = sorted((float(s["x"]), float(s["x"]) + float(s["w"]))
                    for s in spans)
        merged = [list(iv[0])]
        for a, b in iv[1:]:
            if a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        best_cut, best_gap = None, COLUMN_GAP
        for (a0, b0), (a1, b1) in zip(merged, merged[1:]):
            gap = a1 - b0
            if gap >= best_gap:
                best_gap, best_cut = gap, (b0 + a1) / 2.0
        if best_cut is None:
            return [spans]
        left = [s for s in spans
                if float(s["x"]) + float(s["w"]) / 2.0 < best_cut]
        right = [s for s in spans
                 if float(s["x"]) + float(s["w"]) / 2.0 >= best_cut]
        if len(left) < MIN_COLUMN_SPANS or len(right) < MIN_COLUMN_SPANS:
            return [spans]
        return [left, right]

    def column_text(spans):
        spans = sorted(spans, key=lambda s: (float(s["y"]), float(s["x"])))
        lines = []
        for s in spans:
            y = float(s["y"])
            if lines and abs(y - lines[-1][0]) <= LINE_TOL:
                lines[-1][1].append(s)
            else:
                lines.append((y, [s]))
        out, prev_y = [], None
        for y, line_spans in lines:
            line_spans.sort(key=lambda s: float(s["x"]))
            text = " ".join(str(s["text"]).strip() for s in line_spans).strip()
            if not text:
                continue
            if prev_y is not None and (y - prev_y) > PARA_GAP:
                out.append("")
            out.append(text)
            prev_y = y
        return "\n".join(out)

    doc = json.loads(payload)
    pages_out = []
    for page in doc["pages"]:
        spans = page.get("spans", [])
        cols = split_columns([s for s in spans if s.get("text")])
        col_texts = [t for t in (column_text(c) for c in cols) if t]
        if col_texts:
            pages_out.append("\n\n".join(col_texts))
    return "\n\n".join(pages_out)


class TestLayoutParity:
    """The tuple-converted layout kernel must agree with the
    straightforward dict implementation on every input, including
    duplicate coordinates (stable-sort order) and missing 'w' on
    pages too small to column-split."""

    def test_randomized_spans(self):
        import random

        rng = random.Random(29)
        words = ["alpha", "beta", "", " ", "x y", "0", "line text"]
        for _ in range(300):
            pages = []
            for _p in range(rng.randrange(0, 3)):
                spans = []
                for _s in range(rng.randrange(0, 14)):
                    spans.append({
                        "x": rng.choice([50, 50, 330, rng.uniform(0, 600)]),
                        "y": rng.choice([60, 60, 74, rng.uniform(0, 700)]),
                        "w": rng.choice([100, 200, rng.uniform(1, 300)]),
                        "h": 12,
                        "text": rng.choice(words),
                    })
                pages.append({"w": 612, "h": 792, "spans": spans})
            payload = json.dumps({"pages": pages})
            assert layout_to_markdown(payload) == _layout_to_markdown_ref(payload)

    def test_missing_w_small_page_still_renders(self):
        # the original never read 'w' on sub-4-span pages; the tuple
        # version must preserve that laziness
        payload = json.dumps({"pages": [{"spans": [
            {"x": 50, "y": 60, "text": "no width"},
            {"x": 50, "y": 74, "text": "still fine"},
        ]}]})
        assert layout_to_markdown(payload) == "no width\nstill fine"
        assert layout_to_markdown(payload) == _layout_to_markdown_ref(payload)

    def test_corpus_payloads(self):
        from mistralocr_pdf2md_translator_ray.sources.transcripts import (
            generate_transcripts,
        )

        t, _ = generate_transcripts(n_convs=10, n_turns=2000, seed=31)
        n = 0
        for text, tool in zip(t["text"].to_pylist(), t["tool"].to_pylist()):
            if tool == "pdf_layout":
                # the corpus plants malformed payloads (error-as-value
                # path): both implementations must then fail alike
                try:
                    got = ("ok", layout_to_markdown(text))
                except Exception as e:
                    got = ("err", type(e).__name__)
                try:
                    exp = ("ok", _layout_to_markdown_ref(text))
                except Exception as e:
                    exp = ("err", type(e).__name__)
                if got[0] == "err":
                    # ref raises raw JSONDecodeError where the kernel
                    # wraps it in ValueError (a subclass relationship:
                    # both are ValueError) — compare category only
                    assert exp[0] == "err", text[:80]
                else:
                    assert got == exp, text[:80]
                n += 1
        assert n > 50  # the corpus actually exercises this path


class TestMarkdownNormalize:
    def test_setext_to_atx(self):
        assert normalize_markdown("Title\n=====\n\nSub\n---") == "# Title\n\n## Sub"

    def test_bullets_and_ordered(self):
        assert normalize_markdown("* a\n+ b\n1) c") == "- a\n- b\n1. c"

    def test_atx_spacing(self):
        assert normalize_markdown("##Heading##") == "## Heading"
        assert normalize_markdown("#  Spaced   ") == "# Spaced"

    def test_table_normalization(self):
        got = normalize_markdown("|a |b|\n|--|:-:|\n| 1|2 |")
        assert got == "| a | b |\n| --- | :---: |\n| 1 | 2 |"

    def test_fences_verbatim(self):
        src = "```\n* not a bullet\n#notahead\n```"
        assert normalize_markdown(src) == src

    def test_blank_collapse_and_trim(self):
        assert normalize_markdown("\n\n\na\n\n\n\nb\n\n") == "a\n\nb"

    def test_idempotent(self):
        src = "# T\n\n- a\n- b\n\n| x | y |\n| --- | --- |"
        once = normalize_markdown(src)
        assert normalize_markdown(once) == once


class TestMdSpans:
    def test_kinds_and_offsets(self):
        from mistralocr_pdf2md_translator_ray.functions.markdown import md_spans

        md = "# Title\n\npara one\npara two\n\n- a\n- b\n\n```\ncode\n```\n\n---"
        spans = md_spans(md)
        kinds = [s["kind"] for s in spans]
        assert kinds == ["heading", "paragraph", "list", "code", "separator"]
        for s in spans:
            assert md[s["start"]:s["end"]].strip() != ""
        h = spans[0]
        assert md[h["start"]:h["end"]] == "# Title"
        code = spans[3]
        assert md[code["start"]:code["end"]] == "```\ncode\n```"

    def test_empty(self):
        from mistralocr_pdf2md_translator_ray.functions.markdown import md_spans

        assert md_spans("") == []


def _md_spans_ref(md):
    """Straightforward reference for the inlined md_spans (the pre-
    optimization implementation, kept verbatim for the differential)."""
    if not md:
        return []
    spans, pos = [], 0
    cur_kind, cur_start, cur_end = None, 0, 0
    in_fence = False

    def classify(line):
        s = line.lstrip()
        if not s:
            return None
        if s.startswith("#"):
            return "heading"
        if s.startswith("- ") or (s[:1].isdigit() and ". " in s[:5]):
            return "list"
        if s.startswith("|") and line.rstrip().endswith("|"):
            return "table"
        if s.startswith(">"):
            return "quote"
        if s == "---":
            return "separator"
        return "paragraph"

    def flush():
        nonlocal cur_kind
        if cur_kind is not None:
            spans.append({"start": cur_start, "end": cur_end, "kind": cur_kind})
            cur_kind = None

    for line in md.split("\n"):
        start, end = pos, pos + len(line)
        pos = end + 1
        s = line.lstrip()
        if in_fence:
            cur_end = end
            if s.startswith("```") or s.startswith("~~~"):
                in_fence = False
                flush()
            continue
        if s.startswith("```") or s.startswith("~~~"):
            flush()
            cur_kind, cur_start, cur_end = "code", start, end
            in_fence = True
            continue
        kind = classify(line)
        if kind is None:
            flush()
            continue
        if kind == cur_kind and kind in ("list", "table", "quote", "paragraph"):
            cur_end = end
        else:
            flush()
            cur_kind, cur_start, cur_end = kind, start, end
    flush()
    return spans


class TestMdSpansParity:
    """The inlined first-char-dispatch md_spans must agree with the
    straightforward implementation on every input."""

    def test_edge_cases(self):
        from mistralocr_pdf2md_translator_ray.functions.markdown import md_spans

        cases = [
            "", "x", "\n", "#", "# h\n# h2", "- a\n-b\n- c", "---\n----\n---",
            "|a|\n|b", "|a|b|\n  |c|d|", "> q\n>q2\n", "1. a\n2) b\n12. c",
            "```\n# not heading\n```", "~~~\ncode\n~~~\ntail", "```python\nx\n",
            "  ```\nindented fence\n  ```", "`tick\n~squiggle", "9.b\n9. b",
            "para\n\n\npara", "|\n||\n| |", "-\n- \n --", "\t- tab list",
            "０１. fullwidth digits\n5. x",
        ]
        for md in cases:
            assert md_spans(md) == _md_spans_ref(md), repr(md)

    def test_randomized_lines(self):
        import random

        from mistralocr_pdf2md_translator_ray.functions.markdown import md_spans

        rng = random.Random(11)
        atoms = ["# h", "## h2", "- item", "1. one", "2) two", "|a|b|",
                 "|bad", "> quote", "---", "----", "```", "~~~", "text",
                 "  text", "", " ", "\t", "`x", "~y", "9.z", "#x", "- ",
                 "|---|---|", "12345. deep", "1.  sp"]
        for _ in range(500):
            md = "\n".join(rng.choice(atoms)
                           for _ in range(rng.randrange(0, 30)))
            assert md_spans(md) == _md_spans_ref(md), repr(md)

    def test_corpus_texts(self):
        from mistralocr_pdf2md_translator_ray.functions.extract import extract_turn
        from mistralocr_pdf2md_translator_ray.functions.markdown import md_spans
        from mistralocr_pdf2md_translator_ray.sources.transcripts import (
            generate_transcripts,
        )

        t, _ = generate_transcripts(n_convs=10, n_turns=2000, seed=23)
        for text, tool in zip(t["text"].to_pylist(), t["tool"].to_pylist()):
            md, _st, _err = extract_turn(text, tool)
            assert md_spans(md) == _md_spans_ref(md)


class TestScalars:
    def test_sanitize(self):
        assert sanitize_id("my doc name") == "my_doc_name"

    def test_fences(self):
        assert strip_json_fences('```json\n{"a":1}\n```') == '{"a":1}'
        assert strip_json_fences('```\n{}\n```') == "{}"

    def test_pretty_json_roundtrip_and_error(self):
        out, ok = pretty_json('{"b":1,"a":"é"}')
        assert ok and '"é"' in out
        out, ok = pretty_json("{broken")
        assert not ok
        obj = json.loads(out)
        assert "error" in obj and obj["raw_output"] == "{broken"

    def test_splice_left_outer(self):
        md = "before\n\n![img-1](img-1)\n\nafter ![img-2](img-2)"
        got = splice_children(md, {"img-1": '{"x": 1}'})
        assert '```json\n{"x": 1}\n```' in got
        assert "![img-2](img-2)" in got  # unmatched stays plain
        assert got.count("![img-1](img-1)") == 1

    def test_join_pages(self):
        assert join_pages(["a", "b"]) == "a\n\n---\n\nb"


class TestDataUrl:
    def test_decode_with_mime_prefix(self):
        from mistralocr_pdf2md_translator_ray.functions import decode_data_url

        b, mime, ok = decode_data_url("data:image/png;base64,aGVsbG8=")
        assert (b, mime, ok) == (b"hello", "image/png", True)

    def test_decode_bare_base64_no_comma(self):
        from mistralocr_pdf2md_translator_ray.functions import decode_data_url

        b, mime, ok = decode_data_url("aGVsbG8=")
        assert (b, ok) == (b"hello", True)

    def test_mime_linewrapped_base64_decodes(self):
        # MIME encoders wrap base64 at 76 chars; the reference decodes
        # such bodies leniently, so whitespace must not be an error
        from mistralocr_pdf2md_translator_ray.functions import decode_data_url

        b, mime, ok = decode_data_url("data:text/plain;base64,aGVs\nbG8=\n")
        assert (b, mime, ok) == (b"hello", "text/plain", True)
        b, _mime, ok = decode_data_url("aGVs bG8=")
        assert (b, ok) == (b"hello", True)

    def test_invalid_is_error_value_not_exception(self):
        from mistralocr_pdf2md_translator_ray.functions import decode_data_url

        b, _mime, ok = decode_data_url("data:image/png;base64,!!notb64!!")
        assert (b, ok) == (b"", False)
        b, _mime, ok = decode_data_url(None)
        assert (b, ok) == (b"", False)

    def test_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from mistralocr_pdf2md_translator_ray.functions import (
            decode_data_url,
            encode_data_url,
        )

        @settings(max_examples=200, deadline=None)
        @given(st.binary(max_size=512),
               st.sampled_from(["image/png", "image/jpeg", "audio/wav", ""]))
        def prop(payload, mime):
            b, m, ok = decode_data_url(encode_data_url(payload, mime))
            assert ok and b == payload and m == mime

        prop()


class TestInlinePreview:
    def test_inline_replaces_link_target(self):
        from mistralocr_pdf2md_translator_ray.functions import inline_children

        md = "x\n\n![img-1](img-1)\n\ny ![img-2](img-2)"
        got = inline_children(md, {"img-1": "data:image/png;base64,AA=="})
        assert "![img-1](data:image/png;base64,AA==)" in got
        assert "![img-1](img-1)" not in got
        assert "![img-2](img-2)" in got  # unmatched untouched

    def test_combined_preview_plain_join(self):
        from mistralocr_pdf2md_translator_ray.functions import combined_preview

        # the preview joins with a bare blank line, NOT the final-doc
        # "---" separator (mistralocr_app.py:90 vs :716)
        assert combined_preview(["a", "b"]) == "a\n\nb"


class TestTextStats:
    def test_token_count(self):
        assert token_count("a b  c\n d") == 4
        assert token_count("") == 0
        assert token_count("   ") == 0

    @given(st.text(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_token_count_matches_regex(self, s):
        # str.split() must count exactly the \S+ runs the SQL oracle
        # extracts (regexp_extract_all '\S+') — incl. Unicode whitespace
        import re

        assert token_count(s) == len(re.findall(r"\S+", s))

    def test_lang_id(self):
        assert lang_id("the cat sat on the mat and it was good") == "en"
        assert lang_id("der hund ist nicht auf der straße und das ist gut") == "de"
        assert lang_id("数据流批处理") == "zh"
        assert lang_id("") == "und"
        assert lang_id("zzz qqq xxx") == "und"

    def test_quality_monotone_on_garbage(self):
        good = quality_score("The quick brown fox jumps over the lazy dog and runs far away to the hills.")
        bad = quality_score("!!! ??? ### $$$ %%% ^^^ &&&")
        assert good > bad
        assert quality_score("") == 0.0

    def test_fingerprint_stability(self):
        a = fingerprint64("Hello,   world!")
        b = fingerprint64("hello, world!")
        assert a == b  # whitespace/case-insensitive by construction
        assert fingerprint64("different text") != a


class TestTurnKernels:
    def test_dispatch_and_error_value(self):
        md, st, err = extract_turn('{"pages": [', "pdf_layout")
        assert st == "error" and "ValueError" in err and md.startswith("--- ERROR:")
        md, st, err = extract_turn("# plain", "markdown")
        assert (md, st) == ("# plain", "ok")

    def test_process_turn_order(self):
        # splice happens BEFORE normalization: the fenced child JSON
        # passes through normalize verbatim
        text = "* item\n\n![img-0](img-0)"
        md, st, _ = process_turn(text, "markdown", {"img-0": '{"k": 1}'})
        assert st == "ok"
        assert md.startswith("- item")
        assert '```json\n{"k": 1}\n```' in md

    def test_child_payload(self):
        out, st = extract_child_payload(b'{"kind":"figure","caption":"hi"}', "img-9", "figure")
        assert st == "ok"
        obj = json.loads(out)
        assert obj["file_name"] == "img-9"
        assert obj["topics"] == ["figure"]
        assert obj["ocr_contents"]["caption"] == "hi"
        out, st = extract_child_payload(b"{broken", "img-9", "figure")
        assert st == "error" and "error" in json.loads(out)


class TestFastScannerParity:
    """The regex tokenizer and the stdlib HTMLParser drive the same
    block extractor; their outputs must be byte-equal on EVERYTHING —
    the fast path may bail to the parser but never disagree with it."""

    @staticmethod
    def _via_parser(html):
        import mistralocr_pdf2md_translator_ray.functions.html_extract as hx

        if not html or not html.strip():
            return ""
        p = hx._Extractor()
        p.feed(html)
        p.close()
        kept = [b for b in p.blocks if hx._keep(b)]
        out, prev_tag = [], None
        for b in kept:
            line = hx._emit(b)
            if out and not ((b.tag == "li" and prev_tag == "li")
                            or (b.cells is not None and prev_tag == "tr")):
                out.append("")
            out.append(line)
            prev_tag = "tr" if b.cells is not None else b.tag
        return "\n".join(out).strip()

    def test_handcrafted_edges(self):
        from mistralocr_pdf2md_translator_ray.functions import html_to_markdown

        cases = [
            "<p>self close<br/>line two with enough text to keep here</p>",
            "<p>quoted gt <a href='x>y'>link text</a> plus padding text to keep</p>",
            "<p>entity &amp; &lt;tag&gt; &#65; body long enough to keep around</p>",
            "<!-- comment --><p>after a comment this text is long enough to keep</p>",
            "<?pi ?><p>after a processing instruction, enough text to keep</p>",
            "<script>var x = '<p>not content</p>';</script><p>real body text long enough</p>",
            "<p>unterminated <b attr='oops</p><p>second paragraph long enough to keep</p>",
            "<p>bogus < lone bracket and sufficient trailing text to keep it</p>",
            "<P UPPER='case'>uppercase tag with text long enough to keep around</P>",
            "<p>unquoted selfclose <a b=x/>not really self closed, keep this text</p>",
            "<nav foo/><p>bare-attr self close: this text must still be kept</p>",
            "<a hidden/>trailing text after a bare-attr self close, long enough",
            "<p 'a>b'>stray quote not after equals with text long enough to keep</p>",
            '<p "x>y">double stray quote variant with text long enough to keep</p>',
            "<p data-x='1>2' hidden/>quoted value then bare attr self close text</p>",
            '<p ="x>y">bare equals before a quote with text long enough to keep</p>',
            "<p = 'x>y'>spaced bare equals quote variant, enough text to keep</p>",
            '<p a="1" ="x>y">attr then bare equals quote, enough text to keep</p>',
            "<td>orphan cell</td><tr><td>a</td><td>b</td></tr>",
            "text before any tag that is plenty long enough to keep as a block",
            "<ul><li>item one is long</li><li>item two</li></ul><pre>code</pre>",
            "<p>trailing open tag and text long enough to keep <a href=",
            "<p>&notanentity; strange amp usage with text long enough to keep</p>",
        ]
        for html in cases:
            assert html_to_markdown(html) == self._via_parser(html), repr(html)

    def test_random_html_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from mistralocr_pdf2md_translator_ray.functions import html_to_markdown

        tags = st.sampled_from(
            ["p", "div", "li", "h2", "pre", "tr", "td", "a", "b", "nav",
             "script", "ul", "br"])
        piece = st.one_of(
            st.text(max_size=40),
            tags.map(lambda t: f"<{t}>"),
            tags.map(lambda t: f"</{t}>"),
            tags.map(lambda t: f"<{t}/>"),
            tags.map(lambda t: f"<{t} class='x' data-n=\"1>2\">"),
            tags.map(lambda t: f"<{t} hidden/>"),
            tags.map(lambda t: f"<{t} b=x/>"),
            st.sampled_from(["<p 'q>r'>", '<div "s>t">', "<a href='u>v'/>"]),
            st.sampled_from(['<p ="q>r">', "<div = 's>t'>", "<a b= ='u>v'>"]),
            st.sampled_from(["<!-- c -->", "<!doctype html>", "<?php ?>",
                             "&amp;", "&#65;", "&bogus;", "<", ">", "</",
                             "<a href=", "'", '"']),
        )
        @settings(max_examples=300, deadline=None)
        @given(st.lists(piece, max_size=30).map("".join))
        def prop(html):
            assert html_to_markdown(html) == self._via_parser(html)

        prop()


class TestFusedTokenization:
    def test_pretokenized_args_identical(self):
        from mistralocr_pdf2md_translator_ray.functions.textstats import (
            fingerprint64,
            quality_score,
            tokenize,
        )

        samples = [
            "The quick brown fox, and the lazy dog! 42 times.",
            "",
            "   ",
            "word",
            "a b c d e f g " * 50,
            "数据流批处理 mixed 文本 with English words in the stream",
        ]
        for s in samples:
            toks = tokenize(s)
            assert quality_score(s, toks) == quality_score(s)
            assert fingerprint64(s, toks) == fingerprint64(s)
