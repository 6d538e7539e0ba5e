"""Engine execution defaults for Ray Data's DataContext.

Called (idempotently) by the pipeline entry points — never touches the
Ray session itself. HASH_SHUFFLE makes keyed groupbys a real
hash-partition exchange instead of a global sort-based shuffle:
measured 3.7× faster on the ordering-restore groupby at bench scale
(11.7s vs 43.3s at 32 CPUs) and it scales with CPUs instead of
degrading. The aggregator-actor counts MUST be sized to the session:
the defaults (200 partitions / 64 aggregator actors) deadlock a small
local session whose CPUs are already reserved by map-stage actor
pools (observed on the 4-CPU test session).
"""

from __future__ import annotations


def configure_context() -> None:
    import ray
    from ray.data import DataContext

    try:
        from ray.data.context import ShuffleStrategy
    except ImportError:  # pragma: no cover - older Ray
        return
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:  # pragma: no cover
        ncpu = 8
    # Controlled sweep at bench scale (2.15M rows, 32 CPUs, idle box):
    #   aggregators=16 partitions=32  →  7.6s
    #   aggregators=16 partitions=64  → 13.1s
    #   aggregators=64 partitions=200 → 66.0s   (Ray defaults)
    # Cost scales with partition count (per-partition finalize sort +
    # small-block overhead): keep partitions ≈ CPUs, aggregators ≈ CPUs/2.
    # fused-pipeline sweep (extract pool + shuffle sharing one box):
    #   32 CPUs: aggregators=6 partitions=12 → 18.4s total (best);
    #   16/32 → 32.5s. Under contention FEWER aggregators win.
    ctx.max_hash_shuffle_aggregators = max(3, ncpu // 5)
    ctx.default_hash_shuffle_parallelism = max(8, (ncpu * 3) // 8)
