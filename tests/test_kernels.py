"""Unit tests for the pure extraction kernels (no Ray needed)."""

import json

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
