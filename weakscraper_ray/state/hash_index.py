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


@ray.remote
class LSHIndexShard:
    """One shard of a MinHash-LSH band index: bucket key → posting
    list of indexed doc_ids. Same scale shape as :class:`HashIndexShard`
    (hash-partitioned key space, one RPC per batch per shard, no text),
    but lookups return the MATCHING IDS (candidate retrieval), not just
    membership. Posting lists are capped — an overflowing bucket keeps
    its first ``cap`` ids and counts the overflow, visible via
    ``stats()``, never silent (a degenerate bucket, e.g. the empty-text
    signature, would otherwise blow up candidate generation — the same
    policy as ``bucket_pairs``'s ``max_bucket``)."""

    def __init__(self, cap: int = 256) -> None:
        self._buckets: dict[int, list[int]] = {}
        self._cap = cap
        self._overflow = 0

    def add(self, keys: list[int], ids: list[int]) -> int:
        bk = self._buckets
        cap = self._cap
        for k, i in zip(keys, ids):
            lst = bk.get(k)
            if lst is None:
                bk[k] = [i]
            elif len(lst) < cap:
                lst.append(i)
            else:
                self._overflow += 1
        return len(bk)

    def lookup(self, keys: list[int]) -> list[list[int]]:
        bk = self._buckets
        empty: list[int] = []
        return [bk.get(k, empty) for k in keys]

    def stats(self) -> dict:
        return {"n_buckets": len(self._buckets), "overflow": self._overflow}
