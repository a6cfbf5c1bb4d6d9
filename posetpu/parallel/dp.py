"""shard_map data parallelism (SURVEY.md §5.8).

Mesh recipe: one `data` axis over all chips of the slice
(`jax.make_mesh((8,), ('data',))` on v5e-8).  The batch shards along axis 0;
model/optimizer state replicates; gradients and metrics reduce with
pmean/psum over ICI.  BatchNorm uses the same axis name inside the model so
normalization statistics are cross-replica — the 8-chip DP run is
statistically equivalent to the reference's single-device batch (SURVEY.md
§7 hard-part 5).

The reference's only parallelism was single-process nn.DataParallel
scatter/gather (C14); there is no NCCL/MPI translation here by design —
collectives are XLA's, laid out on ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 exports shard_map at top level
    from jax import shard_map as _raw_shard_map

    # replication checking was renamed check_rep -> check_vma with the move
    _CHECK_KW = {"check_vma": False}
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _raw_shard_map

    _CHECK_KW = {"check_rep": False}


def _shard_map(f, **kw):
    return _raw_shard_map(f, **kw, **_CHECK_KW)

DATA_AXIS = "data"


def make_mesh(num_devices=None, axis=DATA_AXIS):
    """1-D device mesh over the first ``num_devices`` visible devices."""
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devs)}"
            )
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_train_step(train_step, mesh, axis=DATA_AXIS, donate=True):
    """Wrap a (state, batch, key) -> (state, metrics) step for DP: batch
    sharded on dim 0, state/key replicated, outputs replicated (grads are
    pmean'd inside the step)."""
    fn = _shard_map(
        train_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def shard_fused_train_step(fused_step, mesh, axis=DATA_AXIS, donate=True):
    """DP wrapper for a K-steps-per-dispatch step (``fuse_steps``):
    ``(state, superbatch, key) -> (state, key, metrics)`` with superbatch
    leaves shaped (K, B, ...) — the batch axis to shard is dim 1 (dim 0 is
    the scan/group axis, identical on every chip)."""
    fn = _shard_map(
        fused_step,
        mesh=mesh,
        in_specs=(P(), P(None, axis), P()),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_batch_placer(mesh=None, axis=DATA_AXIS, stacked=False):
    """Callable for ``HostLoader(place=...)``: device_put each batch from
    the loader's prefetch thread so H2D overlaps device compute.  With a
    mesh, arrays land pre-sharded along the data axis (leading dim — dim 1
    when ``stacked``, i.e. the loader groups K batches per dispatch), so
    the sharded step's dispatch does no implicit re-transfer."""
    if mesh is None:
        return jax.device_put
    spec = P(None, axis) if stacked else P(axis)
    sharding = jax.sharding.NamedSharding(mesh, spec)
    return lambda batch: jax.device_put(batch, sharding)


def shard_eval_step(eval_step, mesh, axis=DATA_AXIS):
    """Wrap a (state, batch) -> (metrics, preds) eval step: metrics
    replicated, per-sample preds stay sharded along the batch."""
    fn = _shard_map(
        eval_step,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P(axis)),
    )
    return jax.jit(fn)
