"""Weight transplant: posetpu flax hourglass -> reference-style torch module.

SURVEY.md §5.4 calls for a torch-compatible export "for cross-validation";
`torch_export.py` pins the flat container layout, and THIS module goes one
step further: it maps the flax parameter tree onto the module names of an
actual reference-style ``torch.nn`` stacked hourglass (the one in
``tools/torch_baseline.py``, which mirrors the reference architecture
SURVEY.md §2 C5), so a transplanted model can run a real torch forward.

tests/test_transplant.py proves the architectures are THE SAME NETWORK:
random flax params -> transplant -> torch forward == flax forward within fp
tolerance on every stack's heatmaps.  That is the strongest architecture
parity evidence available while /root/reference is empty (SURVEY.md §0):
any structural deviation (pre-activation order, skip placement, remap
wiring, BN eps) would show up as a numerical mismatch.

Naming on the torch side follows tools/torch_baseline.build_torch_hourglass
(bearpaw-lineage structure).  If the reference mount is ever populated with
the exact bearpaw key strings, extend _TORCH_NAME only — the tensor
conversion rules (HWIO->OIHW etc.) already match torch conventions.
"""

from __future__ import annotations

import numpy as np

# flax Bottleneck child -> torch Bottleneck child (pre-activation order:
# bn1-relu-conv1(1x1) -> bn2-relu-conv2(3x3) -> bn3-relu-conv3(1x1), proj)
_BOTTLENECK = {
    "BatchNorm_0": "bn1",
    "Conv_0": "conv1",
    "BatchNorm_1": "bn2",
    "Conv_1": "conv2",
    "BatchNorm_2": "bn3",
    "Conv_2": "conv3",
    "proj": "proj",
}


def _module_map(num_stacks: int, num_blocks: int, depth: int = 4):
    """flax module path prefix -> torch module path prefix.

    Only num_blocks=1 hourglasses have a torch counterpart in
    tools/torch_baseline.py (the reference default, BASELINE.json:8-12).
    """
    if num_blocks != 1:
        raise ValueError("torch transplant target is the num_blocks=1 model")
    m = {
        "stem_conv": "stem.0",
        "stem_bn": "stem.1",
        "stem_res1": "stem.3",
        "stem_res2": "stem.5",
        "stem_res3": "stem.6",
    }
    for i in range(num_stacks):
        for d in range(1, depth + 1):
            m[f"hg{i}/up1_d{d}_0"] = f"hgs.{i}.mods.up1_{d}"
            m[f"hg{i}/low1_d{d}_0"] = f"hgs.{i}.mods.low1_{d}"
            m[f"hg{i}/low3_d{d}_0"] = f"hgs.{i}.mods.low3_{d}"
        m[f"hg{i}/low2_d1_0"] = f"hgs.{i}.low2"
        m[f"res{i}_0"] = f"res.{i}"
        m[f"fc{i}_conv"] = f"fc.{i}.0"
        m[f"fc{i}_bn"] = f"fc.{i}.1"
        m[f"score{i}"] = f"score.{i}"
        if i < num_stacks - 1:
            m[f"fc_{i}"] = f"fc_.{i}"
            m[f"score_{i}"] = f"score_.{i}"
    return m


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _convert_leaf(leaf: str, arr: np.ndarray):
    """flax leaf name+tensor -> torch leaf name+tensor."""
    if leaf == "kernel":
        if arr.ndim == 4:  # HWIO -> OIHW
            return "weight", np.transpose(arr, (3, 2, 0, 1))
        return "weight", np.transpose(arr)
    if leaf == "scale":
        return "weight", arr
    if leaf == "mean":
        return "running_mean", arr
    if leaf == "var":
        return "running_var", arr
    return leaf, arr  # bias


def to_reference_state_dict(
    params, batch_stats=None, *, num_stacks, num_blocks=1, depth=4
):
    """Flax HourglassNet variables -> state_dict loadable by
    ``tools.torch_baseline.build_torch_hourglass(num_stacks, feats, classes)``
    via ``model.load_state_dict(...)`` (tensors as numpy; wrap with
    torch.from_numpy on the consumer side)."""
    mmap = _module_map(num_stacks, num_blocks, depth)
    out = {}
    trees = [params] + ([batch_stats] if batch_stats is not None else [])
    for tree in trees:
        for path, arr in _flatten(tree).items():
            mod, _, leaf = path.rpartition("/")
            # Bottleneck children live one level below the mapped module;
            # plain Conv/BN modules map directly.
            if mod in mmap:
                tname = mmap[mod]
            else:
                parent, _, child = mod.rpartition("/")
                if parent not in mmap or child not in _BOTTLENECK:
                    raise KeyError(f"unmapped flax module path: {mod}")
                tname = f"{mmap[parent]}.{_BOTTLENECK[child]}"
            tleaf, tarr = _convert_leaf(leaf, arr)
            out[f"{tname}.{tleaf}"] = np.ascontiguousarray(
                tarr.astype(np.float32)
            )
    return out
