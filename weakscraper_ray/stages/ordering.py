"""Stable (conv_id, turn_idx) ordering restore with hot-conversation
salting (SURVEY.md R3/R4, BASELINE.json "groupby-conv_id plus
per-group sort ... repartitions by conv_id hash with salting for hot
conversations").

Salting scheme: ``salt = turn_idx // turns_per_group``. A normal
conversation (< turns_per_group turns) lands in exactly one
``(conv_id, salt=0)`` group; a hot conversation splits into bounded
contiguous turn-range sub-groups, so no single shuffle partition ever
receives an unbounded group. Because each salt bucket is a contiguous
turn range, per-group sorting yields globally sorted runs — a final
``sort([conv_id, turn_idx])`` (or an order-aware consumer keyed by
``(conv_id, salt)``) restores total order without re-sorting big data.
Requires no pre-pass to identify hot conversations.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: default turns per salt bucket — bounds any shuffle group to this many
#: rows regardless of conversation skew
DEFAULT_TURNS_PER_GROUP = 256


def add_salt(turns_per_group: int = DEFAULT_TURNS_PER_GROUP):
    def _add(batch: pa.Table) -> pa.Table:
        salt = pc.cast(
            pc.floor(pc.divide(batch.column("turn_idx"), turns_per_group)),
            pa.int32(),
        )
        return batch.append_column("salt", salt)

    return _add


def _sort_group(group: pa.Table) -> pa.Table:
    return group.sort_by("turn_idx")


def restore_order(ds, turns_per_group: int = DEFAULT_TURNS_PER_GROUP):
    """groupby(conv_id ⊕ salt) → per-group sort by turn_idx.

    Output groups are internally sorted contiguous turn ranges; block
    order across groups is NOT globally sorted (use
    ``ds.sort(["conv_id", "turn_idx"])`` on small/final artifacts when
    a single totally-ordered view is required — the per-turn equality
    contract only needs stable (conv_id, turn_idx) keyed rows).
    """
    salted = ds.map_batches(add_salt(turns_per_group), batch_format="pyarrow")
    grouped = salted.groupby(["conv_id", "salt"]).map_groups(
        _sort_group, batch_format="pyarrow"
    )
    return grouped.drop_columns(["salt"])
