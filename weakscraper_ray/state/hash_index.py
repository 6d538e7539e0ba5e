"""Sharded distributed membership index held in raw Ray actors.

This is the ONE place the engine drops below the Dataset API on
purpose: a *shared mutable index* queried from inside ``map_batches``
is the pattern Ray Data itself cannot express (its operators are
functional over immutable blocks). SURVEY.md's custom-operator rule
(c) sanctions raw actors exactly here, and the build brief names "a
shared mutable index" as the canonical example.

Scale shape:
- the key space is hash-partitioned over ``n_shards`` actors, so no
  single actor holds the whole index or serializes all traffic — size
  ``n_shards`` to the cluster (one per node holds the 100 TB corpus'
  dedup index in aggregate memory);
- batches route each key to its shard with ONE ``add``/``contains``
  RPC per (batch, shard) pair — never per row; payload is fixed-width
  hex digests, never document text;
- ``contains`` is read-only after the build barrier, so probe-phase
  calls are embarrassingly parallel.

The per-batch ``ray.get`` inside the probe stage is inherent to an
index lookup (it IS the operator) — the r1 "no per-batch ray.get"
rule bans gratuitous driver round-trips in transforms, not the
actor-RPC data path of an index stage.
"""

from __future__ import annotations

import ray


@ray.remote
class HashIndexShard:
    """One shard: an in-memory set of hex-digest membership keys."""

    def __init__(self) -> None:
        self._seen: set[str] = set()

    def add(self, hashes: list[str]) -> int:
        self._seen.update(hashes)
        return len(self._seen)

    def contains(self, hashes: list[str]) -> list[bool]:
        s = self._seen
        return [h in s for h in hashes]

    def size(self) -> int:
        return len(self._seen)


def route(hashes: list[str], n_shards: int) -> list[int]:
    """Deterministic shard id per hex digest (leading 32 bits)."""
    return [int(h[:8], 16) % n_shards for h in hashes]
