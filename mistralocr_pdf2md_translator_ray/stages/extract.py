"""Ray Data stages for the flagship extraction pipeline.

Actor-pool callable classes (state — compiled parsers/regex tables —
built once per actor in ``__init__``, replacing the reference's
process-global API clients, ``mistralocr_app.py:775-800``) plus the
stateless finalize batch UDFs. All stages are Arrow-in/Arrow-out
(``batch_format="pyarrow"``); the per-string kernel work is inherently
scalar, but columns are materialized once per batch and rebuilt as
single Arrow arrays (no per-row Dataset ops).
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.extract import extract_turn, extract_child_payload
from ..functions.markdown import md_spans, normalize_markdown
from ..functions.scalars import splice_children
from ..functions.textstats import token_count


class TurnExtractor:
    """Per-turn extraction: route by ``tool`` and extract raw Markdown.

    Output adds ``raw_md:string status:string error:string`` to the
    input columns.
    """

    def __init__(self, extra_extractors=None) -> None:
        # Per-actor state: bind the compiled kernels once (the module
        # import compiles every regex; holding refs here pins them) and
        # snapshot the driver's extractor registry (stages/registry.py)
        # — serialized into each actor like the reference's
        # process-global clients.
        self._extract = extract_turn
        self._extra = extra_extractors or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tools = batch["tool"].to_pylist()
        raw_mds, statuses, errors = [], [], []
        for text, tool in zip(texts, tools):
            raw, status, err = self._extract(text, tool, self._extra)
            raw_mds.append(raw)
            statuses.append(status)
            errors.append(err)
        return (
            batch.append_column("raw_md", pa.array(raw_mds, pa.string()))
            .append_column("status", pa.array(statuses, pa.string()))
            .append_column("error", pa.array(errors, pa.string()))
        )


class ChildExtractor:
    """Per-payload structuring (ST5 analog): payload bytes ->
    ``extracted`` pretty-JSON + ``child_status``."""

    def __init__(self) -> None:
        self._extract = extract_child_payload

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        pids = batch["payload_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        extracted, statuses = [], []
        for blob, pid, kind in zip(payloads, pids, kinds):
            s, st = self._extract(blob, pid, kind)
            extracted.append(s)
            statuses.append(st)
        return (
            batch.select(["conv_id", "turn_idx", "payload_id"])
            .append_column("extracted", pa.array(extracted, pa.string()))
            .append_column("child_status", pa.array(statuses, pa.string()))
        )


_OUT_COLS = ["conv_id", "turn_idx", "role", "tool", "ts", "md", "spans",
             "n_tokens", "status", "error"]

SPANS_TYPE = pa.list_(
    pa.struct([("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())])
)


def _finalize(batch: pa.Table, children_col: bool,
              emit_original: bool = False) -> pa.Table:
    raws = batch["raw_md"].to_pylist()
    ch = batch["children_json"].to_pylist() if children_col else [None] * len(raws)
    mds, origs, spans, ntoks = [], [], [], []
    for raw, cj in zip(raws, ch):
        if isinstance(cj, str) and cj:  # guard NaN/None from the left join
            raw = splice_children(raw, json.loads(cj))
        md = normalize_markdown(raw)
        mds.append(md)
        if emit_original:
            origs.append(raw)
        spans.append(md_spans(md))
        ntoks.append(token_count(md))
    out = (
        batch.append_column("md", pa.array(mds, pa.string()))
        .append_column("spans", pa.array(spans, SPANS_TYPE))
        .append_column("n_tokens", pa.array(ntoks, pa.int64()))
    )
    if emit_original:
        # dual-variant output (mistralocr_app.py:714-717 writes both
        # final_markdown_original and final_markdown_translated): the
        # pre-normalization spliced text rides alongside, invariant
        # normalize_markdown(md_original) == md
        out = out.append_column("md_original", pa.array(origs, pa.string()))
        return out.select(_OUT_COLS + ["md_original"])
    return out.select(_OUT_COLS)


def finalize_with_children(batch: pa.Table) -> pa.Table:
    """Splice child results below their placeholders (J1+M6), then
    normalize (M12 analog)."""
    return _finalize(batch, children_col=True)


def finalize_with_children_dual(batch: pa.Table) -> pa.Table:
    return _finalize(batch, children_col=True, emit_original=True)


def finalize_plain_dual(batch: pa.Table) -> pa.Table:
    return _finalize(batch, children_col=False, emit_original=True)


def build_child_rows(child_df):
    """Reduce child rows to one (conv_id, turn_idx, children_json) row
    per turn — the deterministic JSON map the cogroup merge builds;
    runs inside cluster buckets for the broadcast join's small side."""
    import pandas as pd

    child_df = child_df.sort_values(["conv_id", "turn_idx", "payload_id"],
                                    kind="mergesort")
    agg = (
        child_df.groupby(["conv_id", "turn_idx"], sort=False)
        .apply(lambda g: json.dumps(dict(zip(g["payload_id"], g["extracted"])),
                                    ensure_ascii=False, sort_keys=True),
               include_groups=False)
        .rename("children_json")
        .reset_index()
    )
    return agg[["conv_id", "turn_idx", "children_json"]]


class ExtractFinalizeBroadcast:
    """Fused single-pass stage for the broadcast-join path: extract ->
    splice (children from the broadcast map) -> normalize -> token
    count, one Arrow->Python->Arrow round-trip per batch. The split
    extract/finalize pair paid that conversion twice over every turn's
    text (~2x total CPU at bench scale).

    Actor pool: the child map is fetched once per actor in __init__
    (zero-copy plasma read + one deserialize), like the reference's
    process-global clients. ``cmap_refs`` may be a list of PENDING
    partial-map ObjectRefs (the overlapped path: raw Ray tasks compute
    child partials while this pipeline's read stages already stream;
    each actor blocks here only until the partials land)."""

    def __init__(self, cmap_ref=None, cmap_refs=None, extra_extractors=None,
                 emit_original: bool = False) -> None:
        import ray

        if cmap_refs is not None:
            cmap: dict = {}
            for part in ray.get(list(cmap_refs)):
                for k, v in part.items():
                    cmap.setdefault(k, {}).update(v)
            self._cmap = cmap
        else:
            self._cmap = ray.get(cmap_ref) if cmap_ref is not None else {}
        self._extra = extra_extractors or {}
        self._emit_original = emit_original

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        tools = batch["tool"].to_pylist()
        convs = batch["conv_id"].to_pylist()
        turns = batch["turn_idx"].to_pylist()
        mds, origs, spans, ntoks, statuses, errors = [], [], [], [], [], []
        for text, tool, conv, turn in zip(texts, tools, convs, turns):
            raw, status, err = extract_turn(text, tool, self._extra)
            cj = self._cmap.get((conv, turn))
            if cj:
                raw = splice_children(raw, json.loads(cj) if isinstance(cj, str) else cj)
            md = normalize_markdown(raw)
            mds.append(md)
            if self._emit_original:
                origs.append(raw)
            spans.append(md_spans(md))
            ntoks.append(token_count(md))
            statuses.append(status)
            errors.append(err)
        out = (
            batch.append_column("md", pa.array(mds, pa.string()))
            .append_column("spans", pa.array(spans, SPANS_TYPE))
            .append_column("n_tokens", pa.array(ntoks, pa.int64()))
            .append_column("status", pa.array(statuses, pa.string()))
            .append_column("error", pa.array(errors, pa.string()))
        )
        if self._emit_original:
            out = out.append_column("md_original", pa.array(origs, pa.string()))
            return out.select(_OUT_COLS + ["md_original"])
        return out.select(_OUT_COLS)


def finalize_plain(batch: pa.Table) -> pa.Table:
    """Normalize-only path for turns with no placeholders."""
    return _finalize(batch, children_col=False)


# ---------------------------------------------------------------------------
# Bucketed co-group merge (J1 + A1): runs inside stages/joins.cogroup.
# The child aggregation (regroup by (conv,turn), the reference's
# ``ocr_by_page``, mistralocr_app.py:513-519) and the left-outer merge
# happen vectorized per bucket — never one UDF call per tiny group.
# ---------------------------------------------------------------------------

PARENT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
    ("raw_md", pa.large_string()),
    ("status", pa.string()),
    ("error", pa.string()),
])

CHILD_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("payload_id", pa.string()),
    ("extracted", pa.large_string()),
])


def merge_children_into_parents(ldf, rdf):
    """cogroup merge_fn: parents (ldf) left-join aggregated children
    (rdf) on (conv_id, turn_idx); children collapse to a deterministic
    JSON map sorted by payload_id."""
    import pandas as pd

    if ldf.empty:
        return ldf.assign(children_json=pd.Series(dtype=object))
    if rdf.empty:
        return ldf.assign(children_json=None)
    rdf = rdf.sort_values(["conv_id", "turn_idx", "payload_id"], kind="mergesort")
    agg = (
        rdf.groupby(["conv_id", "turn_idx"], sort=False)
        .apply(lambda g: json.dumps(dict(zip(g["payload_id"], g["extracted"])),
                                    ensure_ascii=False, sort_keys=True),
               include_groups=False)
        .rename("children_json")
        .reset_index()
    )
    return ldf.merge(agg, on=["conv_id", "turn_idx"], how="left")
