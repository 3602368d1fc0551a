"""Deterministic synthetic transcript corpus (FIXTURES.md F1/F2).

Generates the authoritative input table from BASELINE.json
``input_hint``::

    conv_id:string turn_idx:int32 role:string text:string tool:string
    ts:timestamp[us]

plus the flattened child-payload table::

    conv_id:string turn_idx:int32 payload_id:string kind:string
    payload:binary

Properties (seeded, default seed=42; pure ``random.Random`` — no global
state):
- zipf-ish conversation sizes plus one "hot" conversation holding
  ~half of all turns (exercises salting / skew handling)
- turn kinds: plain markdown, HTML page with boilerplate, PDF-layout
  span JSON; some turns carry ``![img-k](img-k)`` placeholders with a
  matching child-payload row
- edge rows: empty text, whitespace-only, CJK unicode, malformed HTML,
  malformed layout JSON (-> status='error'), malformed child payload
- ``ts`` strictly increasing within a conversation
- ``(conv_id, turn_idx)`` unique and dense per conversation

Everything is generated in one process; for multi-GB bench corpora use
``write_transcripts_parquet`` which shards generation across Ray tasks
(each shard re-seeds from (seed, shard) so output is stable regardless
of task scheduling).
"""

from __future__ import annotations

import datetime as _dt
import json
import random
import zlib

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

PAYLOAD_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("payload_id", pa.string()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
    ]
)

_WORDS = (
    "the data stream batch merge sort shuffle table row column key value "
    "join filter group window agg query plan stage actor block arrow "
    "parquet spill hash range scan index model token text span page image "
    "layout markdown heading list code quote link anchor nav footer main"
).split()

_CJK = "数据流批处理合并排序洗牌表行列键值联接过滤分组窗口聚合查询计划阶段"

_ROLES = ("user", "assistant", "tool")
_EPOCH = _dt.datetime(2024, 1, 1)


def _sentence(rng: random.Random, lo: int = 6, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(rng: random.Random, lo: int = 2, hi: int = 5) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(lo, hi)))


def _markdown_turn(rng: random.Random, placeholders: list[str]) -> str:
    parts: list[str] = [f"# {_sentence(rng, 3, 6)[:-1]}"]
    for _ in range(rng.randint(1, 3)):
        parts.append(_paragraph(rng))
    if rng.random() < 0.5:
        parts.append("\n".join(f"- {_sentence(rng, 3, 7)}" for _ in range(rng.randint(2, 5))))
    if rng.random() < 0.3:
        parts.append(f"```\n{_sentence(rng)}\n{_sentence(rng)}\n```")
    for pid in placeholders:
        parts.append(f"![{pid}]({pid})")
        parts.append(_paragraph(rng, 1, 2))
    return "\n\n".join(parts)


def _html_turn(rng: random.Random, placeholders: list[str]) -> str:
    """HTML page: nav/header/footer boilerplate + link farm around a
    main <article>. Long-enough paragraphs, short link-heavy chrome."""
    nav_links = "".join(
        f'<a href="/{w}">{w}</a> ' for w in rng.sample(_WORDS, rng.randint(4, 8))
    )
    article: list[str] = [f"<h1>{_sentence(rng, 3, 6)[:-1]}</h1>"]
    for _ in range(rng.randint(2, 4)):
        article.append(f"<p>{_paragraph(rng)}</p>")
    if rng.random() < 0.5:
        article.append(f"<h2>{_sentence(rng, 2, 5)[:-1]}</h2>")
        article.append(f"<p>{_paragraph(rng)}</p>")
    if rng.random() < 0.4:
        items = "".join(f"<li>{_sentence(rng, 4, 9)}</li>" for _ in range(rng.randint(2, 4)))
        article.append(f"<ul>{items}</ul>")
    if rng.random() < 0.3:
        article.append(f"<blockquote>{_sentence(rng, 8, 14)}</blockquote>")
    for pid in placeholders:
        article.append(f"<p>{_paragraph(rng, 1, 2)} ![{pid}]({pid})</p>")
    return (
        "<html><head><title>t</title></head><body>"
        f"<nav>{nav_links}</nav>"
        f"<header><p>{_sentence(rng, 2, 4)}</p></header>"
        f'<div class="ads"><p><a href="/x">click</a> <a href="/y">now</a></p></div>'
        f"<article>{''.join(article)}</article>"
        f"<footer><p>{nav_links}</p></footer>"
        "</body></html>"
    )


def _layout_turn(rng: random.Random) -> str:
    """1-2 column positioned span JSON; reading order well separated."""
    two_col = rng.random() < 0.4
    pages = []
    for _ in range(rng.randint(1, 2)):
        spans = []
        cols = [(50.0, 250.0), (330.0, 250.0)] if two_col else [(50.0, 500.0)]
        for cx, cw in cols:
            y = 60.0
            for _p in range(rng.randint(1, 3)):
                for _l in range(rng.randint(2, 5)):
                    spans.append(
                        {"x": cx, "y": round(y, 1), "w": cw, "h": 12.0,
                         "text": _sentence(rng, 4, 8)}
                    )
                    y += 14.0
                y += 30.0  # paragraph gap > PARA_GAP
        pages.append({"w": 612, "h": 792, "spans": spans})
    return json.dumps({"pages": pages})


def _payload_blob(rng: random.Random, kind: str) -> bytes:
    if kind == "table_image":
        body = {"rows": [[rng.randint(0, 99) for _ in range(3)] for _ in range(3)]}
    elif kind == "figure":
        body = {"caption": _sentence(rng), "axes": ["x", "y"]}
    else:  # receipt
        body = {"total": round(rng.uniform(1, 500), 2),
                "items": [rng.choice(_WORDS) for _ in range(3)]}
    return json.dumps({"kind": kind, **body}).encode("utf-8")


_EDGE_TEXTS = [
    ("", ""),                                  # empty, tool=""
    ("   \n\t  ", "markdown"),                 # whitespace only
    ("# 標題\n\n" + _CJK + "。", "markdown"),   # CJK unicode
    ("<p>Unclosed <b>bold <p>another para that is long enough to keep",
     "html"),                                  # malformed HTML (lenient)
    ('{"pages": [{"spans": [', "pdf_layout"),  # malformed JSON -> error row
]


def generate_transcripts(
    n_convs: int = 20,
    n_turns: int = 200,
    seed: int = 42,
    hot_conv: bool = True,
    payload_rate: float = 0.12,
) -> tuple[pa.Table, pa.Table]:
    """Return (transcripts, payloads) Arrow tables. Deterministic."""
    rng = random.Random(seed)
    # ---- conversation sizes: zipf-ish + one hot conversation ----------
    n_convs = max(2, n_convs)
    weights = [1.0 / (i + 1) for i in range(n_convs - 1)]
    wsum = sum(weights)
    reserve = len(_EDGE_TEXTS)
    body_turns = max(n_convs + reserve, n_turns) - reserve
    hot_n = body_turns // 2 if hot_conv else 0
    rest = body_turns - hot_n
    sizes = [max(1, round(rest * w / wsum)) for w in weights]
    sizes = [hot_n if hot_conv else max(1, rest // n_convs)] + sizes

    t_rows = {k: [] for k in TRANSCRIPT_SCHEMA.names}
    p_rows = {k: [] for k in PAYLOAD_SCHEMA.names}
    payload_seq = 0

    def add_turn(conv: str, idx: int, text: str, tool: str, ts_us: int) -> None:
        t_rows["conv_id"].append(conv)
        t_rows["turn_idx"].append(idx)
        t_rows["role"].append(_ROLES[idx % 3])
        t_rows["text"].append(text)
        t_rows["tool"].append(tool)
        t_rows["ts"].append(ts_us)

    for ci, size in enumerate(sizes):
        conv = f"conv-{ci:06d}"
        ts_us = int((_EPOCH + _dt.timedelta(hours=ci)).timestamp() * 1_000_000)
        for ti in range(size):
            ts_us += rng.randint(1_000_000, 30_000_000)
            kind = rng.random()
            placeholders: list[str] = []
            if rng.random() < payload_rate:
                for _ in range(rng.randint(1, 2)):
                    pid = f"img-{payload_seq}"
                    payload_seq += 1
                    placeholders.append(pid)
                    pkind = rng.choice(("table_image", "figure", "receipt"))
                    blob = (
                        b'{"broken": '  # malformed child payload -> error value
                        if rng.random() < 0.05
                        else _payload_blob(rng, pkind)
                    )
                    p_rows["conv_id"].append(conv)
                    p_rows["turn_idx"].append(ti)
                    p_rows["payload_id"].append(pid)
                    p_rows["kind"].append(pkind)
                    p_rows["payload"].append(blob)
            if kind < 0.4:
                add_turn(conv, ti, _markdown_turn(rng, placeholders), "markdown", ts_us)
            elif kind < 0.75:
                add_turn(conv, ti, _html_turn(rng, placeholders), "html", ts_us)
            else:
                add_turn(conv, ti, _layout_turn(rng), "pdf_layout", ts_us)

    # ---- edge-case conversation (last, fixed content) -----------------
    conv = f"conv-{len(sizes):06d}"
    ts_us = int((_EPOCH + _dt.timedelta(days=30)).timestamp() * 1_000_000)
    for ti, (text, tool) in enumerate(_EDGE_TEXTS):
        ts_us += 1_000_000
        add_turn(conv, ti, text, tool, ts_us)
    # single-turn conversation
    add_turn(f"conv-{len(sizes) + 1:06d}", 0, _paragraph(rng), "markdown", ts_us + 1)

    t_rows["ts"] = pa.array(t_rows["ts"], type=pa.timestamp("us"))
    transcripts = pa.table(t_rows, schema=TRANSCRIPT_SCHEMA)
    payloads = pa.table(p_rows, schema=PAYLOAD_SCHEMA)
    return transcripts, payloads


def generate_transcripts_table(scale: str = "tiny", seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Named scales from FIXTURES.md."""
    if scale == "tiny":
        return generate_transcripts(n_convs=20, n_turns=200, seed=seed)
    if scale == "small":
        return generate_transcripts(n_convs=200, n_turns=20_000, seed=seed)
    raise ValueError(f"unknown scale {scale!r} (use generate_transcripts for bench sizes)")


def write_transcripts_parquet(
    out_dir: str,
    n_shards: int = 8,
    turns_per_shard: int = 25_000,
    convs_per_shard: int = 50,
    seed: int = 42,
) -> tuple[str, str]:
    """Shard fixture generation across Ray tasks for bench-scale corpora.

    Each shard re-seeds ``random.Random((seed, shard))`` and prefixes its
    conv ids, so the corpus is deterministic and shards never collide.
    Returns (transcripts_dir, payloads_dir).
    """
    import os

    import ray

    t_dir = os.path.join(out_dir, "transcripts")
    p_dir = os.path.join(out_dir, "payloads")
    os.makedirs(t_dir, exist_ok=True)
    os.makedirs(p_dir, exist_ok=True)

    @ray.remote
    def _shard(i: int) -> None:
        import pyarrow.parquet as pq

        t, p = generate_transcripts(
            n_convs=convs_per_shard,
            n_turns=turns_per_shard,
            seed=hash((seed, i)) & 0x7FFFFFFF,
            hot_conv=(i == 0),
        )
        # prefix conv ids with the shard so they are globally unique
        for tbl, path in ((t, t_dir), (p, p_dir)):
            conv = pa.compute.binary_join_element_wise(
                f"s{i:04d}-", tbl["conv_id"].combine_chunks(), ""
            )
            tbl = tbl.set_column(tbl.schema.get_field_index("conv_id"), "conv_id", conv)
            pq.write_table(tbl, os.path.join(path, f"part-{i:05d}.parquet"))

    ray.get([_shard.remote(i) for i in range(n_shards)])
    return t_dir, p_dir


def write_skewed_transcripts_parquet(
    out_dir: str,
    n_shards: int = 8,
    turns_per_shard: int = 25_000,
    convs_per_shard: int = 50,
    seed: int = 42,
) -> tuple[str, str]:
    """Pathological-skew bench corpus: ONE conversation holds ~50% of
    ALL turns (the round-1 skew scenario), spread across half the
    shards so its rows arrive from many input files — exactly the shape
    the adaptive salted assembly exists for. The other half of the
    shards are normal zipf-ish conversations (with payloads).

    Deterministic like ``write_transcripts_parquet``: each shard
    re-seeds from (seed, shard). Returns (transcripts_dir, payloads_dir).
    """
    import os

    import ray

    t_dir = os.path.join(out_dir, "transcripts")
    p_dir = os.path.join(out_dir, "payloads")
    os.makedirs(t_dir, exist_ok=True)
    os.makedirs(p_dir, exist_ok=True)
    n_normal = n_shards // 2

    @ray.remote
    def _normal_shard(i: int) -> None:
        import pyarrow.parquet as pq

        t, p = generate_transcripts(
            n_convs=convs_per_shard,
            n_turns=turns_per_shard,
            seed=hash((seed, i)) & 0x7FFFFFFF,
            hot_conv=False,
        )
        for tbl, path in ((t, t_dir), (p, p_dir)):
            conv = pa.compute.binary_join_element_wise(
                f"s{i:04d}-", tbl["conv_id"].combine_chunks(), ""
            )
            tbl = tbl.set_column(tbl.schema.get_field_index("conv_id"), "conv_id", conv)
            pq.write_table(tbl, os.path.join(path, f"part-{i:05d}.parquet"))

    @ray.remote
    def _hot_shard(i: int) -> None:
        """One contiguous turn_idx range of the single hot conversation."""
        import pyarrow.parquet as pq

        # zlib.crc32, not hash(): str hashing is PYTHONHASHSEED-randomized
        # per worker process, which would make the corpus nondeterministic.
        rng = random.Random(zlib.crc32(f"{seed}-hot-{i}".encode()) & 0x7FFFFFFF)
        start = (i - n_normal) * turns_per_shard
        rows = {k: [] for k in TRANSCRIPT_SCHEMA.names}
        ts_us = int(_EPOCH.timestamp() * 1_000_000) + start * 2_000_000
        for ti in range(start, start + turns_per_shard):
            ts_us += rng.randint(1_000, 1_999_999)
            kind = rng.random()
            if kind < 0.4:
                text, tool = _markdown_turn(rng, []), "markdown"
            elif kind < 0.75:
                text, tool = _html_turn(rng, []), "html"
            else:
                text, tool = _layout_turn(rng), "pdf_layout"
            rows["conv_id"].append("hot-conv")
            rows["turn_idx"].append(ti)
            rows["role"].append(_ROLES[ti % 3])
            rows["text"].append(text)
            rows["tool"].append(tool)
            rows["ts"].append(ts_us)
        rows["ts"] = pa.array(rows["ts"], type=pa.timestamp("us"))
        pq.write_table(pa.table(rows, schema=TRANSCRIPT_SCHEMA),
                       os.path.join(t_dir, f"part-{i:05d}.parquet"))

    ray.get([_normal_shard.remote(i) for i in range(n_normal)]
            + [_hot_shard.remote(i) for i in range(n_normal, n_shards)])
    return t_dir, p_dir
