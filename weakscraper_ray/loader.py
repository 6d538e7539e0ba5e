"""Training-consumption surface: the last-mile iterator a training job
drives after the curation pipelines have done their work.

Ray Data's published pattern for feeding trainers is
``Dataset.iter_batches`` (streaming, prefetching, zero materialization
of the full epoch) — this module wraps it with the two properties a
pretraining loop actually needs and the raw API doesn't give:

- DETERMINISTIC EPOCH ORDER: ``seed`` + ``epoch`` derive the
  ``random_shuffle`` seed, so run N of epoch E sees exactly the rows of
  run M of epoch E in the same order — resumable training without a
  driver-side index. (Same contract as ``shuffle_train``, which pins
  the determinism in tests.)
- FIXED BATCH GEOMETRY: ``drop_last`` trims the ragged tail batch so
  every step sees the same shape (the trainer's compiled step should
  never re-trace).

Scale: ``iter_batches`` pulls blocks through the streaming executor
with backpressure — the epoch never materializes; ``prefetch_batches``
hides the object-store fetch behind compute. The shuffle is the one
deliberate all-to-all, identical to ``shuffle_train``'s.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa


def iter_training_batches(
    ds,
    *,
    batch_size: int = 1024,
    seed: int = 42,
    epoch: int = 0,
    drop_last: bool = True,
    prefetch_batches: int = 2,
) -> Iterator[pa.Table]:
    """Deterministic, fixed-geometry epoch iterator over a Dataset.

    The per-epoch seed is ``seed * 100003 + epoch`` (distinct epochs →
    distinct shuffles; same (seed, epoch) → identical order across
    processes, which is what makes mid-epoch resume reproducible).
    """
    epoch_seed = seed * 100003 + epoch
    shuffled = ds.random_shuffle(seed=epoch_seed)
    for batch in shuffled.iter_batches(
        batch_size=batch_size,
        batch_format="pyarrow",
        prefetch_batches=prefetch_batches,
        drop_last=drop_last,
    ):
        yield batch
