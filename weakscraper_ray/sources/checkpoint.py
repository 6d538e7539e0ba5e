"""Resumable partitioned output + per-partition lineage/metrics
manifest (SURVEY.md §4.3; BASELINE.json "per-partition checkpoints
recording lineage and extraction metrics ... resumes from the last
committed partition").

Layout:

    out/part={partition_id}/data.parquet
    out/_manifest/{partition_id}.json

Commit protocol: write data to a temp file → fsync → atomic rename →
write manifest (the manifest's existence IS the commit point). A rerun
calls :func:`committed_partitions` and prunes finished partitions
BEFORE the extract stage, so committed work is neither recomputed nor
rewritten. Metrics roll-up (R5) reads only the tiny manifests.

Partition key: ``shard = hash(conv_id) % n_shards`` — the same key the
pipeline's ordering groupby uses, so one output partition holds whole
conversations (no cross-partition turn splits).
"""

from __future__ import annotations

import hashlib
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def shard_of(conv_id: str, n_shards: int) -> int:
    digest = hashlib.blake2b(conv_id.encode(), digest_size=8).digest()
    return int.from_bytes(digest, "little") % n_shards


def add_shard_column(n_shards: int):
    """Vectorized shard derivation: dictionary-encode conv_id, blake2b
    each DISTINCT id once, scatter (same code path as the ordering
    stage's conv hash — stages/ordering._conv_hash — so sink shards and
    ordering shards always agree)."""
    import numpy as np

    from ..stages.ordering import _conv_hash

    def _add(batch: pa.Table) -> pa.Table:
        shards = (_conv_hash(batch.column("conv_id")) % np.uint64(n_shards)).astype(
            np.int32
        )
        return batch.append_column("shard", pa.array(shards, pa.int32()))

    return _add


def committed_partitions(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for f in os.listdir(mdir):
        if f.endswith(".json") and not f.startswith("_"):
            out.add(int(f[: -len(".json")]))
    return out


def check_sharding(out_dir: str, n_shards: int) -> None:
    """Resume correctness requires the SAME n_shards across runs —
    otherwise old partition ids alias new ones and rows silently skip
    (ADVICE r1). The first run records n_shards in _manifest/_meta.json;
    later runs fail fast on mismatch."""
    mdir = os.path.join(out_dir, "_manifest")
    meta_path = os.path.join(mdir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            recorded = json.load(fh).get("n_shards")
        if recorded != n_shards:
            raise ValueError(
                f"checkpoint at {out_dir!r} was written with n_shards="
                f"{recorded}; resuming with n_shards={n_shards} would "
                "silently skip uncommitted rows — rerun with "
                f"--shards {recorded} or a fresh output dir"
            )
        return
    os.makedirs(mdir, exist_ok=True)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"n_shards": n_shards}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, meta_path)


def prune_committed(ds, out_dir: str, n_shards: int, has_shard: bool = False):
    """R6 resume anti-join: drop rows whose shard already committed.

    The committed set is tiny → broadcast as a plain Python set inside
    the filter batch fn (no shuffle). Call this on the RAW input,
    BEFORE the extract stage, so a resume skips the expensive work —
    not just the writes (the CLI wires it that way); the sink calls it
    again (idempotent, ``has_shard=True``) for crash-safety between
    the two points."""
    check_sharding(out_dir, n_shards)
    if not has_shard:
        ds = ds.map_batches(add_shard_column(n_shards), batch_format="pyarrow")
    done = committed_partitions(out_dir)
    if not done:
        return ds
    done_arr = pa.array(sorted(done), pa.int32())

    def _filter(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(batch.column("shard"), value_set=done_arr))
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def _write_one_partition(group: pa.Table, out_dir: str,
                         fmt: str = "parquet",
                         chaos_hook=None) -> pa.Table:
    """Runs inside groupby(shard).map_groups (Arrow in / Arrow out, so
    nested columns like ``spans`` survive intact) — writes one
    partition atomically and returns its manifest row.

    ``fmt="jsonl"`` emits newline-delimited JSON parts,
    ``fmt="csv"`` RFC-4180 CSV parts (quoted fields survive embedded
    newlines/quotes in extracted HTML text — round-trip tested against
    the CSV source) and ``fmt="orc"`` ORC parts (columnar warehouse
    export; nested columns survive like parquet) instead of parquet,
    completing the source/sink format matrix. Manifests, atomicity and
    resume are format-agnostic — the committed set is keyed on
    manifest files."""
    shard = int(group.column("shard")[0].as_py())
    if chaos_hook is not None:  # test seam: fault injection at the
        chaos_hook(shard, "pre_data")  # commit protocol's two phases
    pdir = os.path.join(out_dir, f"part={shard}")
    os.makedirs(pdir, exist_ok=True)
    drop = ["shard"]
    inputs: list[str] = []
    if "path" in group.column_names:
        # input lineage: which source files fed this partition (the
        # `path` column comes from read_transcripts(include_paths=True))
        inputs = sorted(
            {os.path.basename(p) for p in pc.unique(group.column("path")).to_pylist()}
        )
        drop.append("path")
    data = group.drop_columns(drop).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )

    ext = fmt if fmt in ("parquet", "csv", "orc") else "jsonl"
    tmp = os.path.join(pdir, f".data.{ext}.tmp")
    final = os.path.join(pdir, f"data.{ext}")
    if fmt == "parquet":
        pq.write_table(data, tmp)
    elif fmt == "orc":
        from pyarrow import orc as _orc

        _orc.write_table(data, tmp)
    elif fmt == "csv":
        import pyarrow.csv as pacsv

        # CSV is flat: nested columns (e.g. the spans list<struct>)
        # serialize as JSON strings, mirroring how the CSV *source*
        # expects structured payloads
        flat_cols = {}
        for name in data.column_names:
            col = data.column(name)
            if pa.types.is_nested(col.type):
                flat_cols[name] = pa.array(
                    [json.dumps(v) for v in col.to_pylist()], pa.string()
                )
            else:
                flat_cols[name] = col
        pacsv.write_csv(pa.table(flat_cols), tmp)
    else:
        data.to_pandas().to_json(
            tmp, orient="records", lines=True, date_format="iso",
            force_ascii=False,
        )
    with open(tmp, "rb") as fh:
        os.fsync(fh.fileno())
    os.replace(tmp, final)
    if chaos_hook is not None:  # between data replace and manifest
        chaos_hook(shard, "pre_manifest")  # commit — the torn window

    convs = data.column("conv_id")
    turns = data.column("turn_idx")
    content_hash = hashlib.md5(
        "\x1e".join(
            f"{c}\x1f{t}" for c, t in zip(convs.to_pylist(), turns.to_pylist())
        ).encode()
    ).hexdigest()

    def _sum(col: str) -> int:
        if col not in data.column_names:
            return 0
        return int(pc.sum(data.column(col)).as_py() or 0)

    n_errors = 0
    if "status" in data.column_names:
        n_errors = int(
            pc.sum(pc.equal(data.column("status"), "error")).as_py() or 0
        )
    manifest = {
        "partition_id": shard,
        "rows": data.num_rows,
        "conversations": len(pc.unique(convs)),
        "nodes_matched": _sum("nodes_matched"),
        "boilerplate_bytes_stripped": _sum("boilerplate_bytes_stripped"),
        "errors": n_errors,
        "key_hash": content_hash,
        "inputs": inputs,
    }
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    mtmp = os.path.join(mdir, f".{shard}.json.tmp")
    with open(mtmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(mtmp, os.path.join(mdir, f"{shard}.json"))
    return pa.Table.from_pylist([manifest])


def write_partitioned(ds, out_dir: str, n_shards: int = 16, resume: bool = True,
                      has_shard: bool = False, fmt: str = "parquet",
                      _chaos_write_hook=None):
    """Checkpointed sink: shard by conv-hash → one atomic partition +
    manifest per shard. Returns the manifest rows (small DataFrame).

    Streaming-friendly: the groupby is the pipeline's existing
    conv-keyed shuffle; each group writes its own partition in the
    worker, so no driver materialization of data. ``has_shard=True``
    when the caller already ran prune_committed upstream (pre-extract).
    ``_chaos_write_hook(shard, phase)`` is the fault-injection seam
    (phases ``pre_data`` / ``pre_manifest``) used by the crash-atomicity
    chaos tests; it ships with the write closure so it executes in the
    worker.
    """
    os.makedirs(out_dir, exist_ok=True)
    check_sharding(out_dir, n_shards)
    if resume:
        ds = prune_committed(ds, out_dir, n_shards, has_shard=has_shard)
    elif not has_shard:
        ds = ds.map_batches(add_shard_column(n_shards), batch_format="pyarrow")
    # Pin the sort-based shuffle for this groupby: the resume filter can
    # empty the stream entirely, and Ray 2.49's hash-shuffle aggregator
    # crashes sorting schema-less empty blocks. Each Dataset SNAPSHOTS
    # its DataContext at creation, so the override must go on the
    # dataset's own context (the global one is ignored at exec time).
    # The hot-path ordering groupby keeps HASH_SHUFFLE (context.py).
    try:
        from ray.data.context import ShuffleStrategy

        ds.context.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
    except ImportError:  # pragma: no cover
        pass
    # the hook rides the closure (serialized with it), so fault
    # injection reaches the WORKER executing the write — a driver-side
    # monkeypatch would not (workers import the module fresh)
    manifests = ds.groupby("shard").map_groups(
        lambda g: _write_one_partition(
            g, out_dir, fmt=fmt, chaos_hook=_chaos_write_hook
        ),
        batch_format="pyarrow",
    )
    return manifests.to_pandas()


def metrics_rollup(out_dir: str) -> dict:
    """R5 roll-up from manifests only (never rereads data)."""
    mdir = os.path.join(out_dir, "_manifest")
    total = {
        "partitions": 0,
        "rows": 0,
        "conversations": 0,
        "nodes_matched": 0,
        "boilerplate_bytes_stripped": 0,
        "errors": 0,
    }
    if not os.path.isdir(mdir):
        return total
    for f in sorted(os.listdir(mdir)):
        if not f.endswith(".json") or f.startswith("_"):
            continue
        with open(os.path.join(mdir, f)) as fh:
            m = json.load(fh)
        total["partitions"] += 1
        for k in ("rows", "conversations", "nodes_matched",
                  "boilerplate_bytes_stripped", "errors"):
            total[k] += m.get(k, 0)
    return total
