"""Stacked hourglass pose network — TPU-first flax rebuild of the reference's
`models/hg.py` (SURVEY.md §2 C5; Newell ECCV'16 architecture).

Reference architecture parity:
  * stem: 7x7/s2 conv (64) -> BN/ReLU -> bottleneck to 128 -> 2x2 maxpool ->
    bottlenecks to 256 (= num_feats * expansion)
  * N stacked recursive hourglass modules, 4 levels of down/up with
    nearest-neighbor upsampling and residual skips
  * pre-activation Bottleneck (BN-ReLU-1x1 -> BN-ReLU-3x3 -> BN-ReLU-1x1,
    expansion 2)
  * per-stack 1x1 conv head -> K heatmaps (intermediate supervision), with
    fc_/score_ remaps added back into the feature stream between stacks

TPU-first design choices (not in the reference):
  * NHWC layout (XLA:TPU native); 256 feature channels tile the 128-lane
    MXU/VPU exactly
  * bfloat16 activations/compute with float32 params and BN statistics
  * optional cross-replica BatchNorm via ``axis_name`` so shard_map
    data-parallel training at small per-chip batch stays statistically
    equivalent to the reference's single-device run (SURVEY.md §7 hard-part 5)
  * optional ``jax.checkpoint`` (remat) per hourglass stack to trade FLOPs
    for HBM on deep stacks
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class Bottleneck(nn.Module):
    """Pre-activation bottleneck residual, expansion 2 (reference
    `models/hg.py Bottleneck`): BN-ReLU-1x1(planes) -> BN-ReLU-3x3(planes)
    -> BN-ReLU-1x1(2*planes), identity or 1x1-projection skip."""

    planes: int  # bottleneck width; output channels = 2 * planes
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        out_ch = 2 * self.planes
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
        )
        conv = partial(
            nn.Conv, dtype=self.dtype, param_dtype=jnp.float32, use_bias=True
        )
        residual = x
        y = norm()(x)
        y = nn.relu(y)
        y = conv(self.planes, (1, 1))(y)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(self.planes, (3, 3), padding=1)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = conv(out_ch, (1, 1))(y)
        if x.shape[-1] != out_ch:
            residual = conv(out_ch, (1, 1), name="proj")(x)
        return y + residual


def _nearest_upsample2(x):
    """2x nearest-neighbor upsample in NHWC (reference uses
    nn.Upsample(scale_factor=2)); pure reshape/broadcast — VPU-only."""
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class Hourglass(nn.Module):
    """One recursive hourglass module (reference `models/hg.py Hourglass`):
    at each of ``depth`` levels, a skip branch of residuals plus a pooled
    branch that recurses, then upsamples and adds."""

    planes: int  # bottleneck width (features = 2 * planes)
    num_blocks: int = 1
    depth: int = 4
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    def _res(self, x, train, name):
        for j in range(self.num_blocks):
            x = Bottleneck(
                self.planes,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name=f"{name}_{j}",
            )(x, train=train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = True):
        def level(n, x):
            up1 = self._res(x, train, f"up1_d{n}")
            low = nn.max_pool(x, (2, 2), strides=(2, 2))
            low1 = self._res(low, train, f"low1_d{n}")
            if n > 1:
                low2 = level(n - 1, low1)
            else:
                low2 = self._res(low1, train, f"low2_d{n}")
            low3 = self._res(low2, train, f"low3_d{n}")
            up2 = _nearest_upsample2(low3)
            return up1 + up2

        return level(self.depth, x)


class _Stack(nn.Module):
    """One hourglass stack + heads + inter-stack remap, shaped for nn.scan
    (carry = feature stream, per-step output = score heatmaps).  The last
    stack's remap is computed and discarded (~2% extra FLOPs) so every
    step is identical — the price of compiling the body once."""

    planes: int
    num_blocks: int
    num_classes: int
    depth: int
    train: bool
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, _):
        ch = 2 * self.planes
        conv = partial(
            nn.Conv, dtype=self.dtype, param_dtype=jnp.float32, use_bias=True
        )
        y = Hourglass(
            self.planes,
            num_blocks=self.num_blocks,
            depth=self.depth,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="hg",
        )(x, train=self.train)
        for j in range(self.num_blocks):
            y = Bottleneck(
                self.planes,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name=f"res_{j}",
            )(y, train=self.train)
        y = conv(ch, (1, 1), name="fc_conv")(y)
        y = nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.9,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
            name="fc_bn",
        )(y)
        fc = nn.relu(y)
        score = nn.Conv(
            self.num_classes,
            (1, 1),
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="score",
        )(fc.astype(jnp.float32))
        fc_ = conv(ch, (1, 1), name="fc_")(fc)
        score_ = conv(ch, (1, 1), name="score_")(score.astype(self.dtype))
        return x + fc_ + score_, score


class HourglassNet(nn.Module):
    """Full stacked network (reference `models/hg.py HourglassNet`; factory
    defaults hg(num_stacks=8, num_blocks=1, num_classes=16)).

    ``scan_stacks`` compiles the stack body ONCE via nn.scan (stacked
    params, lax.scan at runtime) instead of unrolling N copies — cuts
    8-stack compile time several-fold with identical math up to the remap
    of the final stack being computed-and-discarded."""

    num_stacks: int = 8
    num_blocks: int = 1
    num_classes: int = 16
    num_feats: int = 128  # bottleneck width at hourglass resolution
    depth: int = 4
    dtype: Any = jnp.bfloat16
    axis_name: Optional[str] = None
    remat: bool = False
    scan_stacks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, 256, 256, 3) NHWC float. Returns list of ``num_stacks``
        (B, 64, 64, K) heatmap tensors (f32), one per stack (intermediate
        supervision, reference loss sums over all of them)."""
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
        )
        conv = partial(
            nn.Conv, dtype=self.dtype, param_dtype=jnp.float32, use_bias=True
        )
        ch = 2 * self.num_feats  # 256

        x = x.astype(self.dtype)
        # --- stem: 256x256 -> 64x64 ---
        x = conv(64, (7, 7), strides=(2, 2), padding=3, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu(x)
        x = Bottleneck(
            64, dtype=self.dtype, axis_name=self.axis_name, name="stem_res1"
        )(x, train=train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = Bottleneck(
            self.num_feats,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="stem_res2",
        )(x, train=train)
        x = Bottleneck(
            self.num_feats,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="stem_res3",
        )(x, train=train)

        if self.scan_stacks:
            stack_cls = _Stack
            if self.remat:
                stack_cls = nn.remat(stack_cls)
            scanned = nn.scan(
                stack_cls,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
                length=self.num_stacks,
            )(
                self.num_feats,
                self.num_blocks,
                self.num_classes,
                self.depth,
                train,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name="stacks",
            )
            _, scores = scanned(x, None)
            # (num_stacks, B, H, W, K) -> list per stack, matching the
            # unrolled interface
            return [scores[i] for i in range(self.num_stacks)]

        # remat: recompute each hourglass in the backward pass (HBM for FLOPs
        # trade; `train` is static arg index 2 counting the module itself).
        hg_cls = (
            nn.remat(Hourglass, static_argnums=(2,)) if self.remat else Hourglass
        )
        outputs = []
        for i in range(self.num_stacks):
            y = hg_cls(
                self.num_feats,
                num_blocks=self.num_blocks,
                depth=self.depth,
                dtype=self.dtype,
                axis_name=self.axis_name,
                name=f"hg{i}",
            )(x, train)
            for j in range(self.num_blocks):
                y = Bottleneck(
                    self.num_feats,
                    dtype=self.dtype,
                    axis_name=self.axis_name,
                    name=f"res{i}_{j}",
                )(y, train=train)
            y = conv(ch, (1, 1), name=f"fc{i}_conv")(y)
            y = norm(name=f"fc{i}_bn")(y)
            fc = nn.relu(y)
            score = nn.Conv(
                self.num_classes,
                (1, 1),
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                name=f"score{i}",
            )(fc.astype(jnp.float32))
            outputs.append(score)
            if i < self.num_stacks - 1:
                fc_ = conv(ch, (1, 1), name=f"fc_{i}")(fc)
                score_ = conv(ch, (1, 1), name=f"score_{i}")(
                    score.astype(self.dtype)
                )
                x = x + fc_ + score_
        return outputs


def hg(num_stacks=8, num_blocks=1, num_classes=16, **kw):
    """Factory matching the reference entry point `hg(...)`."""
    return HourglassNet(
        num_stacks=num_stacks, num_blocks=num_blocks, num_classes=num_classes, **kw
    )
