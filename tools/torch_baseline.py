"""Reference-style torch-CPU baseline (SURVEY.md §6: the reference never
published throughput, so BASELINE.md rows must be *measured*; torch-CPU is
the only torch runtime in this environment).

This mimics the reference's per-batch path faithfully IN STRUCTURE:
host-side augmentation with the numpy oracles (affine crop warp + Gaussian
rasterize, exactly the reference numerics) feeding a torch stacked-hourglass
fwd/bwd with summed-stack MSE and RMSprop.  It is benchmark-only code: the
posetpu compute path never touches torch.

Usage: python tools/torch_baseline.py [--stacks 2] [--batch 6] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_torch_hourglass(stacks, feats, classes):
    import torch
    import torch.nn as nn

    ch = 2 * feats

    class Bottleneck(nn.Module):
        def __init__(self, cin, planes):
            super().__init__()
            cout = 2 * planes
            self.bn1 = nn.BatchNorm2d(cin)
            self.conv1 = nn.Conv2d(cin, planes, 1)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
            self.bn3 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, cout, 1)
            self.proj = nn.Conv2d(cin, cout, 1) if cin != cout else None
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            r = x if self.proj is None else self.proj(x)
            y = self.conv1(self.relu(self.bn1(x)))
            y = self.conv2(self.relu(self.bn2(y)))
            y = self.conv3(self.relu(self.bn3(y)))
            return y + r

    class Hourglass(nn.Module):
        def __init__(self, planes, depth=4):
            super().__init__()
            self.depth = depth
            c = 2 * planes
            self.mods = nn.ModuleDict()
            for d in range(1, depth + 1):
                self.mods[f"up1_{d}"] = Bottleneck(c, planes)
                self.mods[f"low1_{d}"] = Bottleneck(c, planes)
                self.mods[f"low3_{d}"] = Bottleneck(c, planes)
            self.low2 = Bottleneck(c, planes)
            self.pool = nn.MaxPool2d(2)
            self.up = nn.Upsample(scale_factor=2, mode="nearest")

        def _level(self, d, x):
            up1 = self.mods[f"up1_{d}"](x)
            low1 = self.mods[f"low1_{d}"](self.pool(x))
            low2 = self._level(d - 1, low1) if d > 1 else self.low2(low1)
            low3 = self.mods[f"low3_{d}"](low2)
            return up1 + self.up(low3)

        def forward(self, x):
            return self._level(self.depth, x)

    class HGNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 7, 2, 3),
                nn.BatchNorm2d(64),
                nn.ReLU(inplace=True),
                Bottleneck(64, 64),
                nn.MaxPool2d(2),
                Bottleneck(128, feats),
                Bottleneck(ch, feats),
            )
            self.hgs = nn.ModuleList([Hourglass(feats) for _ in range(stacks)])
            self.res = nn.ModuleList([Bottleneck(ch, feats) for _ in range(stacks)])
            self.fc = nn.ModuleList(
                [
                    nn.Sequential(
                        nn.Conv2d(ch, ch, 1), nn.BatchNorm2d(ch), nn.ReLU(inplace=True)
                    )
                    for _ in range(stacks)
                ]
            )
            self.score = nn.ModuleList(
                [nn.Conv2d(ch, classes, 1) for _ in range(stacks)]
            )
            self.fc_ = nn.ModuleList(
                [nn.Conv2d(ch, ch, 1) for _ in range(stacks - 1)]
            )
            self.score_ = nn.ModuleList(
                [nn.Conv2d(classes, ch, 1) for _ in range(stacks - 1)]
            )

        def forward(self, x):
            x = self.stem(x)
            outs = []
            for i, hg in enumerate(self.hgs):
                y = self.fc[i](self.res[i](hg(x)))
                s = self.score[i](y)
                outs.append(s)
                if i < len(self.hgs) - 1:
                    x = x + self.fc_[i](y) + self.score_[i](s)
            return outs

    return HGNet()


def host_augment(rng, images, centers, scales, pts_all, res=256, out_res=64):
    """Reference-style host augmentation using the numpy oracles."""
    from posetpu.oracles import crop, draw_labelmap, transform

    B = len(images)
    inp = np.zeros((B, 3, res, res), np.float32)
    tgt = np.zeros((B, 16, out_res, out_res), np.float32)
    for i in range(B):
        s = scales[i] * np.clip(rng.randn() * 0.25 + 1, 0.75, 1.25)
        r = np.clip(rng.randn() * 30, -60, 60) if rng.rand() <= 0.6 else 0.0
        warped = crop(images[i], centers[i], s, (res, res), rot=r)
        inp[i] = warped.transpose(2, 0, 1)
        for k in range(16):
            tp = transform(pts_all[i][k], centers[i], s, (out_res, out_res), rot=r)
            tgt[i, k], _ = draw_labelmap(tgt[i, k], tp - 1, sigma=1)
    return inp, tgt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stacks", type=int, default=2)
    ap.add_argument("--feats", type=int, default=128)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--threads", type=int, default=None)
    args = ap.parse_args()

    import torch

    if args.threads:
        torch.set_num_threads(args.threads)

    rng = np.random.RandomState(0)
    H, W = 384, 512
    images = [rng.rand(H, W, 3) for _ in range(args.batch)]
    centers = [np.array([W / 2 + 0.3, H / 2 + 0.4]) for _ in range(args.batch)]
    scales = [H / 250.0] * args.batch
    pts = [rng.rand(16, 2) * 200 + 100 for _ in range(args.batch)]

    model = build_torch_hourglass(args.stacks, args.feats, 16)
    opt = torch.optim.RMSprop(model.parameters(), lr=2.5e-4)
    crit = torch.nn.MSELoss()

    # warmup
    inp, tgt = host_augment(rng, images, centers, scales, pts, args.res)
    out = model(torch.from_numpy(inp))
    loss = sum(crit(o, torch.from_numpy(tgt)) for o in out)
    loss.backward()
    opt.step()

    t_aug = t_step = 0.0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        ta = time.perf_counter()
        inp, tgt = host_augment(rng, images, centers, scales, pts, args.res)
        t_aug += time.perf_counter() - ta
        ts = time.perf_counter()
        opt.zero_grad()
        out = model(torch.from_numpy(inp))
        loss = sum(crit(o, torch.from_numpy(tgt)) for o in out)
        loss.backward()
        opt.step()
        t_step += time.perf_counter() - ts
    dt = time.perf_counter() - t0
    n = args.batch * args.steps
    print(
        f"torch-cpu {args.stacks}-stack: {n/dt:.2f} img/s total "
        f"(aug {n/t_aug:.1f} img/s, train {n/t_step:.1f} img/s)"
    )


if __name__ == "__main__":
    main()
