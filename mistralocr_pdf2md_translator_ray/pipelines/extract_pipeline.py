"""Flagship pipeline: transcript turns -> clean per-turn Markdown.

Ray-Data-native restatement of the reference's six-stage dataflow
(``mistralocr_app.py:546-765``):

    read_parquet(transcripts)                         # S1
      -> map_batches(TurnExtractor, actor pool)       # M1 doc extraction
      [placeholder-bearing turns only]
      -> payloads -> map_batches(ChildExtractor)      # M3/ST5 child extraction
      -> groupby(conv,turn).map_groups(collect)       # A1 regroup
      -> co-group join with parents (left outer)      # J1 composite-key join
      -> map_batches(finalize: splice+normalize)      # M6 + M12
      [placeholder-free turns]
      -> map_batches(finalize: normalize)             # M12
      -> union                                        # per-turn output
      -> (optional) assemble_conversations            # A2 ordered concat

Scale notes: only the ~10-15% of turns that actually carry placeholders
enter the join shuffle; everything else streams straight through
stateless/actor map stages. The child table is pre-reduced to one row
per (conv_id, turn_idx) before the join so the exchanged volume is
bounded by distinct placeholder-bearing turns, not payload count.
"""

from __future__ import annotations

from typing import Optional

import ray.data
import ray.data as rd

from ..stages.extract import (
    CHILD_SCHEMA,
    PARENT_SCHEMA,
    ChildExtractor,
    ExtractFinalizeBroadcast,
    TurnExtractor,
    build_child_rows,
    finalize_plain,
    finalize_plain_dual,
    finalize_with_children,
    finalize_with_children_dual,
    merge_children_into_parents,
)
from ..stages.joins import cogroup


def _broadcast_child_map(child_mat: "ray.data.Dataset"):
    """Aggregate child rows to one (conv, turn) -> children_json row per
    turn ON THE CLUSTER (bucketed groupby — a driver-side pandas loop
    over every turn was serial-linear), then assemble the broadcast
    dict from the already-aggregated rows."""
    import pyarrow as pa
    import ray

    from ..functions.hashing import bucket_ids
    from ..stages.joins import coalesce_blocks

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("b", bucket_ids(t["conv_id"], 64))

    def per_bucket(g):
        return build_child_rows(g)

    agg = (
        child_mat.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(coalesce_blocks())
        .groupby("b")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    cmap = dict(zip(zip(agg["conv_id"], agg["turn_idx"].astype(int)),
                    agg["children_json"]))
    return ray.put(cmap)


def _payload_files(payloads_path) -> list[str]:
    """Top-level parquet files under a LOCAL payloads path (the
    overlapped raw-task path's listing; non-local URIs and nested
    layouts return [] and route through ``ray.data.read_parquet``,
    which resolves them itself). Accepts a directory, a single file,
    or an explicit list of files (callers extracting a shard subset
    pass the matching payload shards so child extraction isn't run
    for conversations outside the subset)."""
    import os

    if isinstance(payloads_path, (list, tuple)):
        # Remote URIs can't be existence-checked locally: return [] so
        # the caller routes the list through ray.data.read_parquet
        # (which resolves them itself) — the documented non-local path.
        if any("://" in f for f in payloads_path):
            return []
        # An explicit LOCAL list is a hard contract: silently dropping
        # a missing shard would assemble its conversations with
        # unresolved placeholders and no error. (Directory scanning
        # below keeps its documented lenient fallback.)
        bad = [f for f in payloads_path
               if not f.endswith(".parquet") or not os.path.exists(f)]
        if bad:
            raise FileNotFoundError(
                f"payload shard(s) missing or not parquet: {bad}")
        return list(payloads_path)
    if os.path.isdir(payloads_path):
        return sorted(
            os.path.join(payloads_path, f)
            for f in os.listdir(payloads_path)
            if f.endswith(".parquet")
        )
    if payloads_path.endswith(".parquet") and os.path.exists(payloads_path):
        return [payloads_path]
    return []


def _parquet_meta_rows(files: list[str]) -> int:
    """Total row count from parquet FOOTER metadata only — no column
    data is read, so bounding the broadcast path costs milliseconds
    even when the payload table is 100x too big to broadcast."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _filter_conv_partitions(payloads: "rd.Dataset", conv_filter) -> "rd.Dataset":
    """Restrict a payloads Dataset to conversations hashing into the
    pending partitions (resume path for the non-broadcast route).
    crc32 per UNIQUE conv via dictionary encoding + vectorized isin —
    the hash itself stays crc32 (checkpoint stability contract)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import crc32_part_ids

    part_ids, n_parts = conv_filter
    want = np.fromiter(sorted(part_ids), dtype=np.int64, count=len(part_ids))

    def fn(t: pa.Table) -> pa.Table:
        pids = crc32_part_ids(t["conv_id"], n_parts)
        return t.filter(pa.array(np.isin(pids, want)))

    return payloads.map_batches(fn, batch_format="pyarrow")


def _child_partial_refs(files: list[str], conv_filter=None):
    """Launch raw Ray tasks computing per-shard child partial maps
    {(conv, turn): {payload_id: extracted}}; returns pending refs.

    ``conv_filter`` is an optional ``(part_ids:set, n_partitions:int)``
    restricting extraction to conversations hashing into those
    partitions (resume path: don't re-extract children for completed
    partitions)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    k = max(1, min(len(files), cpus))
    shards = [files[i::k] for i in range(k)]

    @ray.remote
    def _partial(shard: list[str]) -> dict:
        import numpy as np
        import pyarrow as _pa
        import pyarrow.parquet as pq

        from ..functions.extract import extract_child_payload
        from ..functions.hashing import crc32_part_ids

        out: dict = {}
        for f in shard:
            t = pq.read_table(
                f, columns=["conv_id", "turn_idx", "payload_id", "kind", "payload"]
            )
            if conv_filter is not None:
                part_ids, n_parts = conv_filter
                want = np.fromiter(sorted(part_ids), dtype=np.int64,
                                   count=len(part_ids))
                pids = crc32_part_ids(t["conv_id"], n_parts)
                t = t.filter(_pa.array(np.isin(pids, want)))
            for conv, turn, pid, kind, blob in zip(
                t["conv_id"].to_pylist(), t["turn_idx"].to_pylist(),
                t["payload_id"].to_pylist(), t["kind"].to_pylist(),
                t["payload"].to_pylist(),
            ):
                extracted, _status = extract_child_payload(blob, pid, kind)
                out.setdefault((conv, turn), {})[pid] = extracted
        return out

    return [_partial.remote(s) for s in shards]


def _broadcast_pipeline(transcripts, plain_pool: dict, ctor_kwargs: dict):
    """Single fused extract+splice+normalize actor pool (the broadcast
    join's streaming side)."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    solo_pool = dict(plain_pool)
    if cpus >= 16:
        # 3/4 of cores — the invariant ceiling (tasks keep 1/4). Swept
        # 20/22/24 at 32 CPUs over 9 interleaved runs: 24 best
        # (22.6-25.2s) vs 20 (23.5-26.0s); reads finish early and the
        # write tasks are light, so the fused stage can own more cores.
        solo_pool["concurrency"] = max(1, (cpus * 3) // 4)
    elif cpus >= 6:
        solo_pool["concurrency"] = max(1, cpus // 2)
    # larger batches amortize the Arrow<->Python conversion (measured
    # +12% at 4096 vs 1024 on ~1-2KB turns); for corpora with very wide
    # turns lower this so batch bytes x pool size fits worker heaps
    solo_pool["batch_size"] = 4096
    return transcripts.map_batches(
        ExtractFinalizeBroadcast,
        batch_format="pyarrow",
        fn_constructor_kwargs=ctor_kwargs,
        **solo_pool,
    )


from ..stages.assemble import assemble_conversations

def _pools() -> tuple[dict, dict, dict]:
    """Actor-pool sizing scaled to the cluster.

    Three pools coexist with the task-based stages (read, route,
    finalize, shuffle, write), so their max sizes must sum to well
    under the CPU count — pools that reserve every core starve the
    tasks and serialize the pipeline (observed: 2.3x slowdown).
    Sizing is asymmetric: ~88%% of turns are placeholder-free and go
    through the plain pool; the placeholder branch and the child
    extractor see ~12%% of rows each. Min 1 everywhere so tiny CPU
    budgets (tests) never deadlock.
    """
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    if cpus >= 16:
        # Fixed pool sizes: autoscaling (1,N) pools ramp up too slowly
        # and leave the stage under-provisioned for most of the run
        # (measured 16s -> 9s on the bench corpus). 3/4 of cores go to
        # the pools, 1/4 stays free for the task-based stages.
        plain = dict(concurrency=cpus // 2, batch_size=1024, num_cpus=1)
        with_ph = dict(concurrency=cpus // 8, batch_size=1024, num_cpus=1)
        child = dict(concurrency=cpus // 8, batch_size=1024, num_cpus=1)
    else:
        # Small budgets (tests): min-1 autoscaling so three pools plus
        # shuffle tasks coexist without reservation deadlock.
        plain = dict(concurrency=(1, max(2, (cpus * 3) // 8)), batch_size=1024,
                     num_cpus=1)
        with_ph = dict(concurrency=(1, max(1, cpus // 8)), batch_size=1024,
                       num_cpus=1)
        child = dict(concurrency=(1, max(1, cpus // 8)), batch_size=1024,
                     num_cpus=1)
    return with_ph, plain, child


BROADCAST_CHILD_MAX_ROWS = 2_000_000


def extract_turns(
    transcripts: "ray.data.Dataset",
    payloads: Optional["ray.data.Dataset"] = None,
    join_partitions: int = 16,  # cogroup path bucket sizing
    child_join: str = "auto",   # "auto" | "broadcast" | "cogroup"
    payloads_path: Optional[str] = None,  # enables the overlapped path
    conv_filter=None,  # (part_ids, n_partitions) resume restriction
    emit_original: bool = False,  # dual-variant output (md_original column)
) -> "ray.data.Dataset":
    """Per-turn extraction; returns Dataset with columns
    (conv_id, turn_idx, role, tool, ts, md, n_tokens, status, error).

    Child-splice join strategy:

    - **broadcast** (chosen by "auto" when the aggregated child table is
      <= BROADCAST_CHILD_MAX_ROWS): the child results ride the object
      store once (``ray.put``) and every finalize task probes the map
      locally. One extraction branch, zero shuffles — the two-branch
      union + sort barrier otherwise serializes the pipeline (measured
      2x wall on the bench corpus).
    - **cogroup** (chosen when the child side is too big to broadcast):
      pre-split on placeholder presence; only the ~12%% of turns that
      carry placeholders enter the bucketed co-group shuffle
      (stages/joins.py).
    """
    from ..stages.registry import get_registry

    with_ph_pool, plain_pool, child_pool = _pools()
    ctor = {"fn_constructor_kwargs": {"extra_extractors": get_registry()}}
    fin_children = finalize_with_children_dual if emit_original else finalize_with_children
    fin_plain = finalize_plain_dual if emit_original else finalize_plain

    # One map task per input BLOCK: a read of few large single-row-group
    # files yields fewer blocks than extraction actors and starves the
    # pool (8 files / 24 actors ran at 1/4 throughput).
    # target_num_rows_per_block splits only blocks LARGER than the
    # target — minimal movement, a pass-through for already-fine inputs
    # (the 48-shard headline A/B'd flat) — and every join strategy
    # below benefits.
    transcripts = transcripts.repartition(target_num_rows_per_block=8192)

    if payloads_path is not None and child_join in ("auto", "broadcast"):
        # Overlapped broadcast path: child partial maps are computed by
        # raw Ray TASKS over the payload parquet shards (the Dataset API
        # cannot express "start the main stream now, block the splice
        # actors on a still-running side computation"); each fused
        # actor awaits the partial refs in __init__ while the main
        # pipeline's read stages already stream.
        #
        # The broadcast is BOUNDED: total child rows come from parquet
        # footer metadata (no data read); past BROADCAST_CHILD_MAX_ROWS
        # the merged per-actor map would not fit worker heaps at scale,
        # so "auto" re-routes to the streaming cogroup join instead
        # (byte-identical output — TestCogroupPathEquality).
        files = _payload_files(payloads_path)
        if files:
            n_child_rows = _parquet_meta_rows(files)
            if child_join == "broadcast" or n_child_rows <= BROADCAST_CHILD_MAX_ROWS:
                refs = _child_partial_refs(files, conv_filter=conv_filter)
                return _broadcast_pipeline(
                    transcripts, plain_pool,
                    {"cmap_refs": refs, "extra_extractors": get_registry(),
                     "emit_original": emit_original})
            payloads = rd.read_parquet(files)
            if conv_filter is not None:
                payloads = _filter_conv_partitions(payloads, conv_filter)
            child_join = "cogroup"
        else:
            # No top-level local parquet files (remote URI, nested
            # layout, or caller passed a Dataset alongside the path):
            # fall back to the Dataset route via Ray's own reader.
            if payloads is None:
                payloads = rd.read_parquet(payloads_path)
            if conv_filter is not None:
                payloads = _filter_conv_partitions(payloads, conv_filter)

    if payloads is None:
        return transcripts.map_batches(
            TurnExtractor, batch_format="pyarrow", **plain_pool, **ctor
        ).map_batches(fin_plain, batch_format="pyarrow")

    if child_join in ("auto", "broadcast"):
        # The child phase runs to completion BEFORE the main pass (its
        # result is the broadcast map), so nothing competes for cores:
        # give it half the cluster instead of the steady-state slice.
        import ray as _r

        cpus = int(_r.cluster_resources().get("CPU", 8))
        burst_pool = dict(child_pool, concurrency=max(2, cpus // 2))
        child_mat = payloads.map_batches(
            ChildExtractor, batch_format="pyarrow", **burst_pool
        ).materialize()
        n_children = child_mat.count()
        if child_join == "broadcast" or n_children <= BROADCAST_CHILD_MAX_ROWS:
            cmap_ref = _broadcast_child_map(child_mat)
            return _broadcast_pipeline(
                transcripts, plain_pool,
                {"cmap_ref": cmap_ref, "extra_extractors": get_registry(),
                 "emit_original": emit_original})
        children = child_mat  # too big to broadcast; reuse for cogroup
    else:
        children = payloads.map_batches(
            ChildExtractor, batch_format="pyarrow", **child_pool
        )

    # Pre-split on the *input* text so each branch extracts its rows
    # exactly once (a lazy Dataset consumed by two branches would
    # re-execute the extraction per branch — 2x cost at scale; the
    # parquet re-scan per branch is the cheap recompute).
    def _route(batch, want: bool):
        import pyarrow.compute as pc

        mask = pc.match_substring(batch["text"], "![")
        return batch.filter(mask if want else pc.invert(mask))

    with_ph = transcripts.map_batches(
        lambda b: _route(b, True), batch_format="pyarrow"
    ).map_batches(TurnExtractor, batch_format="pyarrow", **with_ph_pool, **ctor)
    plain = transcripts.map_batches(
        lambda b: _route(b, False), batch_format="pyarrow"
    ).map_batches(TurnExtractor, batch_format="pyarrow", **plain_pool, **ctor)

    # Bucketed co-group join on (conv_id, turn_idx) — one shuffle with
    # ~num_buckets groups; the child aggregation (A1 regroup) and the
    # left-outer merge (J1) both run vectorized inside each bucket.
    # See stages/joins.py for why this beats per-group map_groups and
    # the actor-backed JoinOperator.
    joined = cogroup(
        with_ph,
        children,
        on=["conv_id", "turn_idx"],
        merge_fn=merge_children_into_parents,
        left_schema=PARENT_SCHEMA,
        right_schema=CHILD_SCHEMA,
        num_buckets=join_partitions * 4,
    )
    spliced = joined.map_batches(fin_children, batch_format="pyarrow")
    plain_out = plain.map_batches(fin_plain, batch_format="pyarrow")
    return spliced.union(plain_out)


def _hot_conversations(transcripts: "ray.data.Dataset",
                       hot_threshold: int,
                       driver_cap: int = 2_000_000) -> set:
    """Conversations longer than ``hot_threshold`` turns, counted on the
    RAW transcript input (``conv_id`` column only). Turn counts are
    invariant under extraction — errors are values, rows are never
    dropped (SURVEY.md §1.1) — so hot detection never consumes the
    expensive extraction stream.

    ADAPTIVE combine: the per-batch partials (one row per (batch,
    conv)) stream to the driver and combine in one vectorized
    groupby — bounded by ``driver_cap`` partial rows (<= 100 MB).
    Past the cap (billions of conversations), it bails to the
    distributed bucketed reduce, which re-executes the conv_id scan
    but never holds a row per conversation in any one heap. The
    driver path removes the bucketed reduce's fixed costs
    (repartition + sort groupby, ~2-3 s) from every normal-scale run."""
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import bucket_ids
    from ..stages.joins import coalesce_blocks

    if hot_threshold <= 0:
        # degenerate: every conversation is hot; collect distinct ids
        # (test-only path — production thresholds are >= thousands)
        return set(transcripts.unique("conv_id"))

    def batch_counts(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("conv_id", as_index=False).agg(n=("conv_id", "size"))

    partials = transcripts.select_columns(["conv_id"]).map_batches(
        batch_counts, batch_format="pandas", batch_size=65536,
    )

    frames: list[pd.DataFrame] = []
    total = 0
    over_cap = False
    for b in partials.iter_batches(batch_format="pandas", batch_size=65536):
        frames.append(b)
        total += len(b)
        if total > driver_cap:
            over_cap = True
            break
    if not over_cap:
        if not frames:
            return set()
        s = pd.concat(frames, ignore_index=True).groupby("conv_id")["n"].sum()
        return set(s[s > hot_threshold].index)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("b", bucket_ids(t["conv_id"], 32))

    def per_bucket(g):
        s = g.groupby("conv_id", as_index=False)["n"].sum()
        return s.loc[s["n"] > hot_threshold, ["conv_id"]]

    hot_rows = (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .repartition(coalesce_blocks())
        .groupby("b")
        .map_groups(per_bucket, batch_format="pandas")
    )
    return {r["conv_id"] for r in hot_rows.take_all()}


@ray.remote
def _conv_counts_shard(files: list[str]) -> dict:
    """Per-shard conversation turn counts from the conv_id column only
    (footer-indexed single-column read; no text bytes move). Null
    conv_ids are dropped — matching the pandas groupby in the Dataset
    hot-scan path, which silently drops NaN keys."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    out: dict = {}
    for f in files:
        vc = _pc.value_counts(pq.read_table(f, columns=["conv_id"])["conv_id"])
        for v, c in zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist()):
            if v is not None:
                out[v] = out.get(v, 0) + c
    return out


@ray.remote
def _hot_from_counts(threshold: int, *partials: dict) -> set:
    """Combine per-shard counts into the hot conv-id set. Holds one
    entry per DISTINCT conversation in a single task heap — same bound
    as the Dataset path's driver-side combine (billions of
    conversations would route through _hot_conversations' distributed
    fallback instead; pass transcripts_path=None there)."""
    agg: dict = {}
    for p in partials:
        for k, v in p.items():
            agg[k] = agg.get(k, 0) + v
    return {k for k, v in agg.items() if v > threshold}


@ray.remote
def _as_value_set(hot: set):
    """Chain a pending hot-set ref into the pa.Array value_set the
    assembly closures consume (keeps the streaming regime's count fully
    overlapped — nothing on the driver ever blocks on it)."""
    import pyarrow as _pa

    return _pa.array(sorted(hot), _pa.string())


def _hot_conversations_from_files(files: list[str], threshold: int):
    """Hot-conversation count as raw Ray tasks over the transcript
    parquet shards; returns a PENDING ObjectRef of the hot set. Much
    cheaper than the full Dataset hot-scan (no Ray Data fixed costs —
    parallel single-column reads + value_counts), and the caller can
    launch it early and get() it only when assembly needs the set."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    k = max(1, min(len(files), cpus // 2))
    shards = [files[i::k] for i in range(k)]
    partials = [_conv_counts_shard.remote(s) for s in shards]
    return _hot_from_counts.remote(threshold, *partials)


#: Below this many turn rows (known from parquet FOOTER metadata only),
#: extract_documents inserts an explicit materialize barrier between
#: extraction and the assembly shuffle. Measured (243k turns, 32 CPUs,
#: interleaved): barrier 13.1 s vs streaming 17.5 s — the all-to-all
#: starves while the extraction actor pool still holds 3/4 of the
#: cores, and Ray's sort-based shuffle holds the whole input in the
#: object store ANYWAY, so below the cap the barrier only adds one
#: bounded extra pass. Past the cap the stream goes straight into the
#: shuffle so the corpus is never held twice (the 100-TB shape).
BARRIER_ASSEMBLY_MAX_ROWS = 2_000_000


def extract_documents(
    transcripts: "ray.data.Dataset",
    payloads: Optional["ray.data.Dataset"] = None,
    salt_span: int | None = 256,
    payloads_path: Optional[str] = None,
    emit_original: bool = False,
    hot_threshold: int = 10_000,
    transcripts_path=None,  # enables footer gating + overlapped hot count
    barrier_max_rows: int = BARRIER_ASSEMBLY_MAX_ROWS,
) -> "ray.data.Dataset":
    """Whole-document output: one row per conversation
    (conv_id, n_turns, doc_md), turn order restored inside groups.
    With ``emit_original`` both variants assemble in one pass
    (doc_md + doc_md_original — the reference's dual
    original/translated outputs, mistralocr_app.py:714-717).

    Assembly is ADAPTIVE in two dimensions. (1) SIZE, gated by parquet
    footer row counts when ``transcripts_path`` is given: bounded
    inputs (<= ``barrier_max_rows``) take an explicit materialize
    BARRIER between extraction and the assembly shuffle — extraction
    runs with its full actor pool, then the all-to-all gets the whole
    cluster (measured 13.1 vs 17.5 s streaming at 243k turns: the
    fused shuffle starves while the pool still holds 3/4 of the cores,
    and Ray's sort-based shuffle holds the input in the object store
    anyway). Unbounded inputs STREAM: hot detection runs as overlapped
    raw tasks over the raw input's conv_id column (turn counts are
    invariant under extraction — errors are values, rows are never
    dropped), and the stream feeds ONE hot-aware shuffle without ever
    being held twice. (2) SKEW: cold conversations finalize in
    phase 1; only hot conversations' doc-level partials take the tiny
    phase-2 shuffle (``assemble_conversations_hotaware``). The earlier
    design split the raw input into concurrent cold/hot extraction
    branches with fractional actor pools — two assembly shuffles and
    double input scans measured 2.2x slower than extract-once on the
    50%%-hot skew corpus.

    Without ``transcripts_path``, assumes ``transcripts`` is cheaply
    re-consumable — a parquet read or in-memory Dataset (the sync hot
    scan re-reads only ``conv_id``). The checkpointed path
    (pipelines/job.py) instead re-reads its checkpoint parquet via
    ``assemble_conversations_adaptive``.

    ``salt_span=None`` forces single-phase for every conversation."""
    import ray

    from ..stages.assemble import assemble_conversations_hotaware

    turns = extract_turns(transcripts, payloads,
                          payloads_path=payloads_path,
                          emit_original=emit_original)
    if salt_span is None:
        return assemble_conversations(turns, salt_span=None,
                                      include_original=emit_original)
    files = _payload_files(transcripts_path) if transcripts_path is not None else []
    if files:
        # Launch the raw-task hot count NOW (parallel single-column
        # reads, no Ray Data fixed costs); both regimes share it.
        hot_ref = _hot_conversations_from_files(files, hot_threshold)
        if _parquet_meta_rows(files) <= barrier_max_rows:
            # Footer-gated BARRIER regime (BARRIER_ASSEMBLY_MAX_ROWS):
            # extraction runs with its full actor pool, then the
            # assembly shuffle gets the whole cluster. The count
            # overlaps the materialize barrier; the get() after it is
            # ~free, and the empty-hot single-phase shortcut stays
            # reachable.
            turns = turns.materialize()
            return assemble_conversations_hotaware(
                turns, ray.get(hot_ref), salt_span=salt_span,
                include_original=emit_original)
        # STREAMING regime: no barrier exists to hide the count behind,
        # so pass a PENDING ref — the count runs WHILE the pipeline's
        # read/extract stages stream, and the assembly closures resolve
        # it at their first batch. (A driver-side get() here would
        # serialize a full conv_id scan in front of a lazy, not-yet-
        # started pipeline — at 100 TB a real serial wall.)
        return assemble_conversations_hotaware(
            turns, _as_value_set.remote(hot_ref), salt_span=salt_span,
            include_original=emit_original)
    hot = _hot_conversations(transcripts, hot_threshold)
    return assemble_conversations_hotaware(turns, hot, salt_span=salt_span,
                                           include_original=emit_original)
