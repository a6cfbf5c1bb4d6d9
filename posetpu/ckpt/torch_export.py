"""Torch-layout checkpoint export/import (SURVEY.md §5.4: "a small export
tool writing/reading the torch-compatible naming for cross-validation").

The reference persists ``checkpoint.pth.tar`` = torch.save of
{epoch, state_dict, optimizer, best_acc}.  This module writes the same
container with our parameters converted to torch conventions (conv kernels
HWIO -> OIHW, BatchNorm scale/bias/mean/var -> weight/bias/running_mean/
running_var).  Key names are the posetpu module paths (the reference's exact
bearpaw key strings are unverifiable — /root/reference was empty at survey
time, SURVEY.md §0 — so we pin OUR canonical naming and keep it stable).
Round-trips bit-exactly through import_torch_checkpoint.
"""

from __future__ import annotations

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


_BN_RENAME = {"scale": "weight", "bias": "bias"}
_BN_STATS_RENAME = {"mean": "running_mean", "var": "running_var"}


def to_torch_state_dict(params, batch_stats=None):
    """Flax variables -> torch-convention state_dict (numpy arrays).

    Conv `kernel` (H, W, I, O) -> `weight` (O, I, H, W); Dense `kernel`
    (I, O) -> `weight` (O, I); BatchNorm scale->weight, stats->running_*.
    """
    out = {}
    for path, arr in _flatten(params).items():
        head, _, leaf = path.rpartition(".")
        if leaf == "kernel":
            if arr.ndim == 4:
                out[f"{head}.weight"] = np.transpose(arr, (3, 2, 0, 1))
            elif arr.ndim == 2:
                out[f"{head}.weight"] = np.transpose(arr, (1, 0))
            else:
                out[f"{head}.weight"] = arr
        elif leaf == "scale":
            out[f"{head}.weight"] = arr
        else:
            out[path] = arr
    if batch_stats is not None:
        for path, arr in _flatten(batch_stats).items():
            head, _, leaf = path.rpartition(".")
            out[f"{head}.{_BN_STATS_RENAME.get(leaf, leaf)}"] = arr
    return out


def from_torch_state_dict(state_dict, params_template, batch_stats_template=None):
    """Inverse of :func:`to_torch_state_dict`, shaped by the templates."""
    flat_p = _flatten(params_template)
    flat_b = _flatten(batch_stats_template) if batch_stats_template else {}
    new_p, new_b = {}, {}
    for path, tmpl in flat_p.items():
        head, _, leaf = path.rpartition(".")
        if leaf == "kernel":
            w = np.asarray(state_dict[f"{head}.weight"])
            if w.ndim == 4:
                new_p[path] = np.transpose(w, (2, 3, 1, 0)).astype(tmpl.dtype)
            elif w.ndim == 2:
                new_p[path] = np.transpose(w, (1, 0)).astype(tmpl.dtype)
            else:
                new_p[path] = w.astype(tmpl.dtype)
        elif leaf == "scale":
            new_p[path] = np.asarray(state_dict[f"{head}.weight"]).astype(tmpl.dtype)
        else:
            new_p[path] = np.asarray(state_dict[path]).astype(tmpl.dtype)
    for path, tmpl in flat_b.items():
        head, _, leaf = path.rpartition(".")
        key = f"{head}.{_BN_STATS_RENAME.get(leaf, leaf)}"
        new_b[path] = np.asarray(state_dict[key]).astype(tmpl.dtype)
    return _unflatten(new_p), (_unflatten(new_b) if batch_stats_template else None)


def _opt_state_to_numpy(opt_state):
    """optax state -> a plain nested {path: ndarray} dict (keyed by the
    jax tree path), picklable without optax classes on the reading side."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    return {
        jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat
    }


def _opt_state_from_numpy(blob, opt_state_template):
    """Inverse of :func:`_opt_state_to_numpy`, shaped by a template (e.g.
    ``tx.init(params)``)."""
    import jax

    paths, treedef = jax.tree_util.tree_flatten_with_path(opt_state_template)
    leaves = [
        np.asarray(blob[jax.tree_util.keystr(path)]).astype(
            np.asarray(tmpl).dtype
        )
        for path, tmpl in paths
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_torch_checkpoint(
    path, params, batch_stats, epoch=0, best_acc=0.0, opt_state=None
):
    """Write the reference's container (SURVEY.md C10): torch.save of
    {'epoch', 'state_dict', 'optimizer', 'best_acc'} -> checkpoint.pth.tar.
    ``optimizer`` holds the optax state as a flat {tree path: array} dict
    (the reference stores torch's optimizer.state_dict(); ours is the optax
    equivalent under our canonical naming)."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
        for k, v in to_torch_state_dict(params, batch_stats).items()
    }
    torch.save(
        {
            "epoch": int(epoch),
            "state_dict": sd,
            "optimizer": (
                _opt_state_to_numpy(opt_state) if opt_state is not None else {}
            ),
            "best_acc": float(best_acc),
        },
        path,
    )


def load_torch_checkpoint(
    path, params_template, batch_stats_template=None, opt_state_template=None
):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in blob["state_dict"].items()}
    params, bstats = from_torch_state_dict(
        sd, params_template, batch_stats_template
    )
    opt_state = None
    if opt_state_template is not None and blob.get("optimizer"):
        opt_state = _opt_state_from_numpy(blob["optimizer"], opt_state_template)
    return (
        params,
        bstats,
        int(blob["epoch"]),
        float(blob["best_acc"]),
        opt_state,
    )
