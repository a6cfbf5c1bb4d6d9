"""Color augmentation + normalization on device (reference dataset
`__getitem__` color jitter and `color_normalize`, SURVEY.md §2 C1/C3)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def color_jitter(images, key, lo=0.8, hi=1.2):
    """Per-sample per-channel multiplicative jitter, clipped to [0, 1]
    (reference: each channel scaled by U(0.8, 1.2) then clamped)."""
    B, _, _, C = images.shape
    scales = jax.random.uniform(key, (B, 1, 1, C), minval=lo, maxval=hi)
    return jnp.clip(images * scales, 0.0, 1.0)


def color_jitter_ps(images, keys, lo=0.8, hi=1.2):
    """:func:`color_jitter` with one PRNG key per sample — each sample's
    jitter depends only on its own key, so the result is invariant to how
    the batch is sharded over a mesh (DP==single-device equivalence)."""
    C = images.shape[-1]
    scales = jax.vmap(
        lambda k: jax.random.uniform(k, (C,), minval=lo, maxval=hi)
    )(keys)
    return jnp.clip(images * scales[:, None, None, :], 0.0, 1.0)


def color_normalize(images, mean, std=None):
    """Subtract the dataset per-channel mean (reference `color_normalize`);
    optional std division for modern configs."""
    out = images - jnp.asarray(mean, images.dtype)[None, None, None, :]
    if std is not None:
        out = out / jnp.asarray(std, images.dtype)[None, None, None, :]
    return out
