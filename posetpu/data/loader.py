"""Decode-only host loader (SURVEY.md §2 C15 rebuilt).

The reference runs decode + augmentation + rasterization in DataLoader fork
workers; here the host does the one thing XLA cannot: variable-size JPEG
decode.  Everything downstream (warp, jitter, targets) happens on device
(:mod:`posetpu.aug.pipeline`).  Batches are padded to one static shape so a
single compiled program serves every step.

Oversized images are integer-cropped (losslessly — pure translation recorded
in the center/keypoint metadata) to the pad window around the person before
padding; pixels beyond the window read as zero on device, mirroring the
reference's zero border for out-of-image samples.

Prefetch: a background thread decodes batch N+1 while the device runs batch
N (double buffering).  `posetpu.data.grain_pipeline` offers a grain-backed
alternative with the same batch contract.
"""

from __future__ import annotations

import queue
import threading

import numpy as np
from PIL import Image



def _decode(path):
    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def load_sample(dataset, i, pad_hw):
    """Decode sample ``i`` and fit it into a (pad_h, pad_w) canvas.

    Returns dict of numpy arrays (image, valid_wh, center, scale, pts, vis).
    Images stay uint8 end-to-end on the host: the device converts to f32
    inside the fused aug program (uint8 H2D is 4x cheaper — BASELINE.md).
    If the decoded image exceeds the canvas, an integer crop window centered
    on the person is taken first and all coordinates are shifted by the
    (integer) offset — an exact, lossless transport of the reference
    geometry into the static shape PROVIDED the person's crop box
    (200 * 1.25 * scale * max aug scale px) fits inside pad_hw; a person
    whose box outruns the window samples zeros where the reference's host
    crop would read real pixels.  Size pad_hw to the dataset (the MPII
    configs use 512, covering scale <= ~1.6 at the default aug range;
    larger-scale people are rare and lose only their crop border).
    """
    pad_h, pad_w = pad_hw
    img = _decode(dataset.image_path(i))
    c, s, pts, vis = dataset.meta(i)
    H, W = img.shape[:2]
    off_x = off_y = 0
    if H > pad_h or W > pad_w:
        # half-up rounding, matching the C++ pool's int(c + 0.5f) — the
        # two backends must pick the SAME window (Python round() is
        # half-to-even and diverged on *.5 centers)
        off_y = min(max(int(c[1] + 0.5) - pad_h // 2, 0), max(H - pad_h, 0))
        off_x = min(max(int(c[0] + 0.5) - pad_w // 2, 0), max(W - pad_w, 0))
        img = img[off_y : off_y + pad_h, off_x : off_x + pad_w]
        H, W = img.shape[:2]
    canvas = np.zeros((pad_h, pad_w, 3), np.uint8)
    canvas[:H, :W] = img
    return {
        "image": canvas,
        "valid_wh": np.array([W, H], np.int32),
        "center": (c - [off_x, off_y]).astype(np.float32),
        "scale": np.float32(s),
        "pts": (pts - [off_x, off_y]).astype(np.float32),
        "vis": vis.astype(np.float32),
        "index": np.int32(i),
        # the crop-window offset, so eval can map predictions back to the
        # ORIGINAL image frame (annotations/preds.mat live there; center/
        # pts above are in the cropped frame)
        "offset": np.array([off_x, off_y], np.int32),
    }


def _collate(items):
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def pad_batch(batch, size):
    """Pad a (possibly ragged) batch to ``size`` rows and attach a ``mask``.

    The final validation batch is generally smaller than the batch size and
    not divisible by the device mesh (e.g. MPII's 2958 val images at batch
    48 over 8 chips leave 30).  Padding repeats the last sample up to the
    one static shape every eval step compiles for; the (size,) float mask
    marks real rows, and the mask-aware eval step reduces with global
    masked sums so padded rows contribute exactly nothing.  Callers trim
    per-sample outputs (preds) back to the true count.
    """
    n = batch["image"].shape[0]
    if n > size:
        raise ValueError(f"batch of {n} larger than pad target {size}")
    mask = np.zeros((size,), np.float32)
    mask[:n] = 1.0
    if n == size:
        return {**batch, "mask": mask}
    out = {
        k: np.concatenate([v, np.repeat(v[-1:], size - n, axis=0)])
        for k, v in batch.items()
    }
    out["mask"] = mask
    return out


def group_stack(src_iter, group):
    """Stack every ``group`` consecutive batches into one superbatch whose
    leaves carry a leading (K, ...) group dim — the input contract of the
    K-steps-per-dispatch fused train step (``posetpu.train.fuse_steps``).
    The final group of an epoch may be smaller (K' < group); callers
    compile once per distinct K (at most two programs per run)."""
    buf = []
    for b in src_iter:
        buf.append(b)
        if len(buf) == group:
            yield {k: np.stack([it[k] for it in buf]) for k in buf[0]}
            buf = []
    if buf:
        yield {k: np.stack([it[k] for it in buf]) for k in buf[0]}


def threaded_place_iter(src_iter, place, prefetch=2):
    """Drive ``src_iter`` from a background thread and apply ``place``
    (async H2D) there, so host work (decode/collate/stack) and the device
    transfer overlap the training step.  HostLoader.__iter__ and
    GrainLoader both build on this; the queue discipline is abandon-safe:
    an early-exited consumer (steps_per_epoch cap, test break, generator
    GC) releases the producer thread and drops prefetched batches —
    with ``place`` those are DEVICE buffers, so a stranded producer would
    leak HBM, not just host RAM."""
    q = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def _put(item):
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for item in src_iter:
                if not _put(place(item)):
                    return
            _put(None)
        except BaseException as e:
            _put(e)

    threading.Thread(target=produce, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except BaseException:
            # queue.Empty ends the drain; anything else is an interpreter-
            # shutdown artifact (stdlib queue's own `raise Empty` breaks
            # once module globals are cleared) — the drain is best-effort
            pass


class HostLoader:
    """Iterable over static-shape batches with background decode prefetch.

    ``backend``: "pil" (pure Python), "native" (C++ parallel JPEG pool,
    posetpu.native), or "auto" (native when buildable, PIL otherwise).
    Files the native pool cannot decode fall back to PIL per sample, so the
    two backends produce identical batch contracts.
    """

    def __init__(
        self,
        dataset,
        batch_size,
        pad_hw=(512, 512),
        shuffle=True,
        seed=0,
        drop_last=True,
        prefetch=2,
        backend="auto",
        place=None,
        group=1,
    ):
        """``place``: optional callable applied to each collated numpy
        batch INSIDE the prefetch thread — pass a ``jax.device_put`` (with
        a NamedSharding for DP, see ``posetpu.parallel.make_batch_placer``)
        so the host->device transfer overlaps the previous step's device
        compute instead of serializing at dispatch (SURVEY.md §7
        hard-part 4: transfer overlap).

        ``group``: stack this many consecutive batches into one (K, B, ...)
        superbatch before ``place`` — feeds the K-steps-per-dispatch fused
        train step (``posetpu.train.fuse_steps``).  ``len(self)`` stays in
        units of train STEPS (batches), not dispatches."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.pad_hw = pad_hw
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.place = place
        if group < 1:
            raise ValueError(f"group must be >= 1, got {group}")
        self.group = group
        self.epoch = 0
        self._decoder = None
        if backend in ("auto", "native"):
            try:
                from posetpu.native import NativeDecoder

                self._decoder = NativeDecoder()
            except Exception:
                if backend == "native":
                    raise

    def _native_batch(self, sel):
        """Decode one batch through the C++ pool; PIL fallback per failure.

        The pool writes straight into the batch image array — no per-item
        split/re-stack copies (matters on decode-bound hosts)."""
        ds = self.dataset
        metas = [ds.meta(int(i)) for i in sel]
        paths = [ds.image_path(int(i)) for i in sel]
        centers = np.stack([m[0] for m in metas]).astype(np.float32)
        images, wh, offs, ok = self._decoder.decode_batch(
            paths, centers, self.pad_hw
        )
        report_off = np.asarray(offs, np.int32).copy()  # surfaced to eval
        for j, i in enumerate(sel):
            if not ok[j]:  # non-JPEG / unreadable: PIL fallback in place
                item = load_sample(ds, int(i), self.pad_hw)
                images[j] = item["image"]
                wh[j] = item["valid_wh"]
                # item's center/pts are ALREADY shifted by its own crop
                # offset: subtract nothing below, but report the offset so
                # eval maps preds back to the original frame
                offs[j] = 0
                report_off[j] = item["offset"]
                metas[j] = (
                    item["center"].astype(np.float64),
                    float(item["scale"]),
                    item["pts"].astype(np.float64),
                    item["vis"].astype(np.float64),
                )
        offs_f = offs.astype(np.float64)
        return {
            "image": images,
            "valid_wh": wh,
            "center": np.stack(
                [m[0] - offs_f[j] for j, m in enumerate(metas)]
            ).astype(np.float32),
            "scale": np.asarray([m[1] for m in metas], np.float32),
            "pts": np.stack(
                [m[2] - offs_f[j] for j, m in enumerate(metas)]
            ).astype(np.float32),
            "vis": np.stack([m[3] for m in metas]).astype(np.float32),
            "index": np.asarray(sel, np.int32),
            "offset": report_off,
        }

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _order(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx

    def _batches(self, order):
        """Plain generator of collated numpy batches for one epoch —
        decode runs wherever this generator is driven from (the prefetch
        thread, via threaded_place_iter)."""
        for b in range(len(self)):
            sel = order[b * self.batch_size : (b + 1) * self.batch_size]
            if self._decoder is not None:
                yield self._native_batch(sel)
            else:
                yield _collate(
                    [load_sample(self.dataset, int(i), self.pad_hw) for i in sel]
                )

    def __iter__(self):
        order = self._order()
        self.epoch += 1
        src = self._batches(order)
        if self.group > 1:
            src = group_stack(src, self.group)
        place = self.place if self.place is not None else (lambda b: b)
        # decode + collate + stack + async H2D all run in the producer
        # thread; the consumer only dequeues ready (device) batches
        yield from threaded_place_iter(src, place, prefetch=self.prefetch)
