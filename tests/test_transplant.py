"""Architecture cross-validation: posetpu flax hourglass == reference-style
torch hourglass, weight-for-weight (SURVEY.md §2 C5, §5.4).

Random flax params are transplanted into the torch module from
tools/torch_baseline.py and both models run the same input: every stack's
heatmaps must agree within fp tolerance.  This catches any structural
divergence (pre-activation order, skip wiring, remap placement, BN eps/
momentum semantics) that shape-only tests cannot.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from posetpu.ckpt.transplant import to_reference_state_dict  # noqa: E402
from posetpu.models import hg  # noqa: E402

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")


def _torch_builder():
    spec = importlib.util.spec_from_file_location(
        "torch_baseline", os.path.join(_TOOLS, "torch_baseline.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.build_torch_hourglass


@pytest.mark.parametrize("stacks", [1, 2])
def test_forward_parity_flax_vs_torch(stacks):
    feats, classes, res = 8, 4, 64
    model = hg(
        num_stacks=stacks,
        num_blocks=1,
        num_classes=classes,
        num_feats=feats,
        dtype=jnp.float32,
    )
    rng = np.random.RandomState(0)
    x = rng.rand(2, res, res, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(x), train=False)
    # randomize BN stats too, so running-stat plumbing is exercised
    variables = jax.tree.map(
        lambda a: a + 0.05 * jnp.asarray(rng.randn(*a.shape), a.dtype)
        if a.ndim > 0
        else a,
        variables,
    )
    outs_flax = model.apply(variables, jnp.asarray(x), train=False)

    tmodel = _torch_builder()(stacks, feats, classes)
    sd = to_reference_state_dict(
        variables["params"], variables["batch_stats"], num_stacks=stacks
    )
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
    )
    assert not missing and not unexpected
    tmodel.eval()
    with torch.no_grad():
        outs_torch = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    assert len(outs_flax) == len(outs_torch) == stacks
    for i, (of, ot) in enumerate(zip(outs_flax, outs_torch)):
        np.testing.assert_allclose(
            np.asarray(of).transpose(0, 3, 1, 2),
            ot.numpy(),
            atol=2e-4,
            rtol=1e-3,
            err_msg=f"stack {i} heatmaps diverge",
        )


def test_transplant_covers_every_torch_param():
    """Every tensor the torch module owns must be produced by the mapping
    (strict load above implies it, but assert the converse too: nothing in
    the flax tree is silently dropped)."""
    feats, classes, stacks = 8, 4, 2
    model = hg(
        num_stacks=stacks,
        num_blocks=1,
        num_classes=classes,
        num_feats=feats,
        dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    sd = to_reference_state_dict(
        variables["params"], variables["batch_stats"], num_stacks=stacks
    )
    tmodel = _torch_builder()(stacks, feats, classes)
    tkeys = {
        k
        for k, _ in tmodel.state_dict().items()
        if not k.endswith("num_batches_tracked")
    }
    assert set(sd) == tkeys
    n_flax = sum(
        np.asarray(leaf).size for leaf in jax.tree.leaves(variables)
    )
    n_sd = sum(v.size for v in sd.values())
    assert n_flax == n_sd
