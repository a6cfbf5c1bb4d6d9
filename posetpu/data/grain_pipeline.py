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

from posetpu.data.loader import load_sample


class _DecodeSample(pg.MapTransform):
    """Decode + pad one sample (runs in grain workers)."""

    def __init__(self, dataset, pad_hw):
        self.dataset = dataset
        self.pad_hw = pad_hw

    def map(self, i):
        return load_sample(self.dataset, int(i), self.pad_hw)


class GrainLoader:
    """Iterable of posetpu batches backed by grain's DataLoader."""

    def __init__(
        self,
        dataset,
        batch_size,
        pad_hw=(512, 512),
        shuffle=True,
        seed=0,
        drop_last=True,
        num_workers=0,
        num_epochs=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        source = pg.InMemoryDataSource(list(range(len(dataset))))
        sampler = pg.IndexSampler(
            num_records=len(dataset),
            shuffle=shuffle,
            seed=seed,
            num_epochs=num_epochs or 1,
            shard_options=pg.NoSharding(),
        )
        self._loader = pg.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[
                _DecodeSample(dataset, pad_hw),
                pg.Batch(batch_size=batch_size, drop_remainder=drop_last),
            ],
            worker_count=num_workers,
        )

    def __len__(self):
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        for batch in self._loader:
            yield {k: np.asarray(v) for k, v in batch.items()}
