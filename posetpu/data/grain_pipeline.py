"""grain-backed input pipeline (SURVEY.md §2 C15 alternative backend).

Same batch contract as :class:`posetpu.data.loader.HostLoader` (uint8 images,
valid_wh/center/scale/pts/vis/index), built on ``grain.python``'s
DataLoader: deterministic index sampling, optional multi-process decode
workers, and checkpointable iteration state (PyGrainCheckpointHandler) —
useful on multi-core TPU hosts where fork workers beat the in-process C++
pool; on this 1-core build machine the thread/C++ HostLoader is the default.
"""

from __future__ import annotations

import grain.python as pg
import numpy as np

from posetpu.data.loader import group_stack, load_sample, threaded_place_iter


class _DecodeSample(pg.MapTransform):
    """Decode + pad one sample (runs in grain workers)."""

    def __init__(self, dataset, pad_hw):
        self.dataset = dataset
        self.pad_hw = pad_hw

    def map(self, i):
        return load_sample(self.dataset, int(i), self.pad_hw)


class GrainLoader:
    """Iterable of posetpu batches backed by grain's DataLoader.

    Matches the HostLoader epoch contract: each ``__iter__`` is one epoch,
    and under ``shuffle`` successive epochs draw a fresh order (the sampler
    is rebuilt per epoch with seed+epoch, mirroring HostLoader._order)."""

    def __init__(
        self,
        dataset,
        batch_size,
        pad_hw=(512, 512),
        shuffle=True,
        seed=0,
        drop_last=True,
        num_workers=0,
        prefetch=2,  # H2D queue depth when place= is set (same knob as
        # HostLoader); without place=, grain's worker buffers do the
        # prefetching and this is a no-op
        backend=None,  # ditto
        place=None,  # same async-H2D hook as HostLoader(place=...)
        group=1,  # stack K batches per (K, B, ...) superbatch, as HostLoader
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_hw = pad_hw
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.place = place
        self.prefetch = prefetch
        if group < 1:
            raise ValueError(f"group must be >= 1, got {group}")
        self.group = group
        self.epoch = 0
        self._source = pg.InMemoryDataSource(list(range(len(dataset))))

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_loader(self, epoch):
        sampler = pg.IndexSampler(
            num_records=len(self.dataset),
            shuffle=self.shuffle,
            seed=self.seed + epoch,
            num_epochs=1,
            shard_options=pg.NoSharding(),
        )
        return pg.DataLoader(
            data_source=self._source,
            sampler=sampler,
            operations=[
                _DecodeSample(self.dataset, self.pad_hw),
                pg.Batch(
                    batch_size=self.batch_size, drop_remainder=self.drop_last
                ),
            ],
            worker_count=self.num_workers,
        )

    def __iter__(self):
        loader = self._epoch_loader(self.epoch)
        self.epoch += 1

        def batches():
            for batch in loader:
                yield {k: np.asarray(v) for k, v in batch.items()}

        src = batches()
        if self.group > 1:
            src = group_stack(src, self.group)
        if self.place is None:
            yield from src
        else:
            # grain iterates on the consumer thread; a plain place() here
            # would serialize the H2D with the train loop — run it in a
            # background thread like HostLoader does
            yield from threaded_place_iter(src, self.place, prefetch=self.prefetch)
