"""Adversarial augmentation agents — SURVEY.md §2 C6 (ASR: scale/rotation
bin predictor) and C13 (AHO: hierarchical occlusion node predictor).

The reference (CVPR'18 arXiv:1805.09707, "adversarial scale & rotation" /
"adversarial hierarchical occluding") trains a small CNN that looks at the
*neutrally cropped* sample and outputs categorical distributions over a
quantized augmentation space; bins that make the pose estimator's loss higher
get rewarded (REINFORCE-style, SURVEY.md §2 C7).  The reference runs this on
GPU with host round-trips per batch; here the agent forward, the categorical
sampling (jax PRNG), and the reward update all live inside one jitted step
(SURVEY.md §3.2).

Bin tables: scale bins multiplicative around 1 spanning [0.75, 1.25]-ish
(2^[-0.4, 0.4] quantized), rotation bins spanning [-30, +30] degrees
(SURVEY.md C6), both configurable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def scale_bin_table(num_bins=7, lo_log2=-0.4, hi_log2=0.4):
    """Multiplicative scale factors 2^linspace(lo, hi), centered on 1."""
    return np.exp2(np.linspace(lo_log2, hi_log2, num_bins)).astype(np.float32)


def rotation_bin_table(num_bins=7, lo_deg=-30.0, hi_deg=30.0):
    """Rotation angles in degrees, linear bins, centered on 0."""
    return np.linspace(lo_deg, hi_deg, num_bins).astype(np.float32)


def occlusion_hierarchy(res=(256, 256), levels=(1, 2, 4)):
    """AHO mask hierarchy (SURVEY.md C13): a coarse-to-fine spatial tree of
    square occluders.  Level g contributes a g x g grid of cells, each cell
    occluding 1/(g+1)-ish of the crop side centered on the cell.  Returns an
    (N, 4) int array of (y0, x0, h, w) boxes; node 0 is "no occlusion".

    Node layout: [none, level levels[0] cells (row-major), level levels[1]
    cells, ...] — :func:`occ_level_offsets` gives the per-level start index
    used by the tree-structured sampler.
    """
    H, W = res
    boxes = [(0, 0, 0, 0)]  # node 0: identity (no occlusion)
    for g in levels:
        ch, cw = H // (g + 1), W // (g + 1)  # occluder size at this level
        for i in range(g):
            for j in range(g):
                cy = int((i + 1) * H / (g + 1))
                cx = int((j + 1) * W / (g + 1))
                boxes.append((cy - ch // 2, cx - cw // 2, ch, cw))
    return np.asarray(boxes, np.int32)


def occ_level_offsets(levels):
    """Start index of each level's cells in the flat node layout of
    :func:`occlusion_hierarchy` (node 0 is "no occlusion")."""
    return _offsets_from_sizes([g * g for g in levels])


def _offsets_from_sizes(sizes):
    """Start index of each level's cells in a flat node layout where node 0
    is "no occlusion" and levels of ``sizes[i]`` cells follow in order."""
    offs, n = [], 1
    for s in sizes:
        offs.append(n)
        n += s
    return np.asarray(offs, np.int32)


# --- body-part hierarchy (SURVEY.md C13: "spatial/body-part hierarchy") ---
#
# Joint groupings in the bearpaw index conventions the datasets use
# (posetpu.oracles.transforms.FLIP_PAIRS): MPII 16 joints (0 r-ankle ..
# 9 head-top, 10-15 arms), LSP 14 joints (0-5 legs, 6-11 arms, 12 neck,
# 13 head-top).  Levels are coarse -> fine: [upper body, lower body] then
# [head, torso, r-arm, l-arm, r-leg, l-leg].
PART_GROUPS = {
    "mpii": (
        ((6, 7, 8, 9, 10, 11, 12, 13, 14, 15), (0, 1, 2, 3, 4, 5)),
        ((8, 9), (2, 3, 6, 7, 12, 13), (10, 11, 12), (13, 14, 15),
         (0, 1, 2), (3, 4, 5)),
    ),
    "lsp": (
        ((6, 7, 8, 9, 10, 11, 12, 13), (0, 1, 2, 3, 4, 5)),
        ((12, 13), (2, 3, 8, 9), (6, 7, 8), (9, 10, 11),
         (0, 1, 2), (3, 4, 5)),
    ),
}


def part_level_sizes(dataset="mpii"):
    """Cells per level of the body-part hierarchy (e.g. (2, 6))."""
    return tuple(len(level) for level in PART_GROUPS[dataset])


def part_occlusion_boxes(pts, vis, dataset="mpii", margin=0.15, min_px=8):
    """PER-SAMPLE occluder boxes derived from the sample's own keypoints —
    the body-part variant of :func:`occlusion_hierarchy` (SURVEY.md C13).

    pts: (B, K, 2) keypoints in CROP pixel coords (x, y); vis: (B, K)
    visibility.  Returns (B, N, 4) int32 (y0, x0, h, w): node 0 is "no
    occlusion", then each level's part boxes in :data:`PART_GROUPS` order.
    A part's box is the bbox of its visible joints expanded by ``margin``
    of its larger side plus ``min_px``; a part with no visible joint gets
    a zero box (occluding it is a no-op, like node 0).

    Fully vectorized (static group lists, jnp reductions) — runs inside the
    jitted joint step, so adversarial occluders follow the person instead
    of a fixed image grid.
    """
    pts = jnp.asarray(pts, jnp.float32)
    v = jnp.asarray(vis, jnp.float32) > 0
    B = pts.shape[0]
    boxes = [jnp.zeros((B, 4), jnp.float32)]
    big = jnp.float32(1e9)
    for level in PART_GROUPS[dataset]:
        for group in level:
            g = jnp.asarray(group, jnp.int32)
            p = pts[:, g, :]  # (B, |g|, 2)
            m = v[:, g]  # (B, |g|)
            any_vis = jnp.any(m, axis=1)
            x = p[..., 0]
            y = p[..., 1]
            x0 = jnp.min(jnp.where(m, x, big), axis=1)
            x1 = jnp.max(jnp.where(m, x, -big), axis=1)
            y0 = jnp.min(jnp.where(m, y, big), axis=1)
            y1 = jnp.max(jnp.where(m, y, -big), axis=1)
            pad = margin * jnp.maximum(x1 - x0, y1 - y0) + min_px
            box = jnp.stack(
                [y0 - pad, x0 - pad, (y1 - y0) + 2 * pad, (x1 - x0) + 2 * pad],
                axis=-1,
            )
            boxes.append(jnp.where(any_vis[:, None], box, 0.0))
    return jnp.stack(boxes, axis=1).astype(jnp.int32)  # (B, N, 4)


class AugAgent(nn.Module):
    """Small CNN: neutral crop -> categorical logits over augmentation bins.

    Heads: scale bins, rotation bins (ASR, C6) and optionally occlusion
    hierarchy nodes (AHO, C13).  Strided convs only (no pooling stack) keep
    it a handful of MXU-friendly matmuls; global average pool at the end.
    """

    num_scale_bins: int = 7
    num_rot_bins: int = 7
    num_occ_nodes: int = 0  # 0 disables the AHO head(s)
    # AHO head organization (SURVEY.md C13): "tree" emits a level head plus
    # per-level cell heads over the coarse->fine SPATIAL grid and samples
    # level-then-cell; "parts" is the same tree sampling over the BODY-PART
    # hierarchy (PART_GROUPS — occluder boxes follow the sample's own
    # keypoints); "flat" is one categorical over all nodes.
    occ_mode: str = "tree"
    occ_levels: Sequence[int] = (1, 2, 4)
    occ_dataset: str = "mpii"  # parts mode: which PART_GROUPS table
    widths: Sequence[int] = (32, 64, 128, 256)
    input_downscale: int = 1  # avg-pool the crop before the stem (2 or 4:
    # bin prediction needs coarse context, not pixels — cuts agent cost 4x/16x)
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, H, W, 3) neutral crop. Returns dict of f32 logits:
        ``scale`` (B, S), ``rot`` (B, R), and ``occ`` (B, N) if enabled."""
        x = x.astype(self.dtype)
        if self.input_downscale > 1:
            k = (self.input_downscale, self.input_downscale)
            x = nn.avg_pool(x, k, strides=k)
        for i, w in enumerate(self.widths):
            x = nn.Conv(
                w,
                (3, 3) if i else (7, 7),
                strides=(2, 2),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.axis_name,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dense(256, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x).astype(jnp.float32)
        out = {
            "scale": nn.Dense(self.num_scale_bins, dtype=jnp.float32, name="head_scale")(x),
            "rot": nn.Dense(self.num_rot_bins, dtype=jnp.float32, name="head_rot")(x),
        }
        if self.num_occ_nodes > 0:
            if self.occ_mode in ("tree", "parts"):
                if self.occ_mode == "tree":
                    levels = tuple(self.occ_levels)
                    sizes = [g * g for g in levels]
                    names = [f"head_occ_cell{g}" for g in levels]
                    what = f"occ_levels={levels}"
                else:
                    sizes = list(part_level_sizes(self.occ_dataset))
                    names = [f"head_occ_part{i}" for i in range(len(sizes))]
                    what = f"PART_GROUPS[{self.occ_dataset!r}]"
                expect = 1 + sum(sizes)
                if self.num_occ_nodes != expect:
                    raise ValueError(
                        f"num_occ_nodes={self.num_occ_nodes} does not match "
                        f"{what} (expected {expect})"
                    )
                # level head: [none, level_0, level_1, ...]
                out["occ_level"] = nn.Dense(
                    len(sizes) + 1, dtype=jnp.float32, name="head_occ_level"
                )(x)
                out["occ_cells"] = tuple(
                    nn.Dense(s, dtype=jnp.float32, name=n)(x)
                    for s, n in zip(sizes, names)
                )
            elif self.occ_mode == "flat":
                out["occ"] = nn.Dense(
                    self.num_occ_nodes, dtype=jnp.float32, name="head_occ"
                )(x)
            else:
                raise ValueError(f"unknown occ_mode {self.occ_mode!r}")
        return out


def sample_bins(key, logits):
    """Sample one bin per sample from categorical ``logits`` (B, N); returns
    (indices (B,), log_probs (B,)).  Used inside the jitted joint step —
    sampling never leaves the device (SURVEY.md §3.2)."""
    idx = jax.random.categorical(key, logits, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    sel = jnp.take_along_axis(logp, idx[:, None], axis=-1)[:, 0]
    return idx, sel


def sample_bins_ps(keys, logits):
    """Per-sample-key variant of :func:`sample_bins`: ``keys`` is (B,) PRNG
    keys (one per sample, e.g. from ``per_sample_keys``).  Each sample's draw
    depends only on its own key and logits, so results are identical whether
    the batch runs whole on one device or sharded over a mesh — the property
    the DP==single-device joint-step equivalence rests on."""
    idx = jax.vmap(lambda k, l: jax.random.categorical(k, l))(keys, logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    sel = jnp.take_along_axis(logp, idx[:, None], axis=-1)[:, 0]
    return idx, sel


def sample_occlusion_tree(keys, level_logits, cell_logits, levels=None):
    """Tree-structured AHO sampling (SURVEY.md C13): sample the hierarchy
    level (including "none"), then the cell within that level; the policy
    log-prob is the sum along the path.

    keys: (B,) per-sample PRNG keys; level_logits: (B, L+1) with column 0 =
    "no occlusion"; cell_logits: tuple of L arrays (B, n_i) — one per
    hierarchy level, grid (n_i = g^2, :func:`occlusion_hierarchy`) or
    body-part (n_i = parts, :data:`PART_GROUPS`).  The flat node layout is
    inferred from the cell head widths; ``levels`` is accepted for
    backward compatibility and ignored.

    Returns (node, lvl, cell, logp), all (B,): ``node`` is the flat index
    into the hierarchy's box table; ``(lvl, cell)`` is the sampled path
    (re-fed to :func:`occlusion_tree_logp` by the REINFORCE objective);
    ``logp`` = log p(level) [+ log p(cell | level)].
    Compiler-friendly: a cell is drawn at every level and the sampled
    level's draw is selected — no data-dependent control flow.
    """
    del levels  # layout comes from the cell head widths
    k_lvl = jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys)
    lvl, logp_lvl = sample_bins_ps(k_lvl, level_logits)  # 0 = none

    cells, logps = [], []
    for li, cl in enumerate(cell_logits):
        k_cell = jax.vmap(lambda k: jax.random.fold_in(k, li + 1))(keys)
        c, lp = sample_bins_ps(k_cell, cl)
        cells.append(c)
        logps.append(lp)
    cells = jnp.stack(cells, axis=1)  # (B, L)
    logps = jnp.stack(logps, axis=1)
    offsets = jnp.asarray(
        _offsets_from_sizes([cl.shape[1] for cl in cell_logits])
    )

    b = jnp.arange(keys.shape[0])
    li = jnp.maximum(lvl - 1, 0)  # level index into the stacked draws
    cell = cells[b, li]
    node = jnp.where(lvl == 0, 0, offsets[li] + cell)
    logp = logp_lvl + jnp.where(lvl == 0, 0.0, logps[b, li])
    return node, lvl, cell, logp


def occlusion_tree_logp(level_logits, cell_logits, lvl, cell):
    """log p of a (level, cell) path under the tree policy — the
    differentiable re-evaluation used by the REINFORCE objective (the
    sampled path is fixed, the logits carry the gradient)."""
    lp_lvl = jnp.take_along_axis(
        jax.nn.log_softmax(level_logits), lvl[:, None], axis=1
    )[:, 0]
    b = jnp.arange(level_logits.shape[0])
    li = jnp.maximum(lvl - 1, 0)
    # clamp per level: `cell` indexes the SAMPLED level's grid and may exceed
    # a smaller level's width; only the sampled level's column is selected
    lp_cells = jnp.stack(
        [
            jax.nn.log_softmax(cl)[b, jnp.minimum(cell, cl.shape[1] - 1)]
            for cl in cell_logits
        ],
        axis=1,
    )
    return lp_lvl + jnp.where(lvl == 0, 0.0, lp_cells[b, li])
