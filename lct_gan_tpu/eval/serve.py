"""Live serving helpers: jit the enhancer with the parameters baked in.

The exported StableHLO artifact (export_model.py) measured 1.07x the
live params-as-argument jit on TPU (tools/bench_export.py, 2026-08-19):
with the weights embedded as compile-time constants, XLA folds all
per-call parameter preparation -- Pallas operand packing/reshapes,
f32->bf16 weight casts, key-bias table construction -- into the
executable instead of re-running it every call. `bake_enhance` gets the
same effect on the LIVE path: closing the params pytree over the traced
function embeds them as constants in the lowered module, so serving
entrypoints that hold the weights fixed (infer.py, bench.py) pay the
prep exactly once, at compile time.

Use the params-as-argument form instead whenever the params change
between calls (training, validation-during-training): a baked function
must recompile for new weights.

Reference counterpart: the TorchScript `FTFNet_scripted.pt` serving
path (Experiments/LCT-GAN model.ipynb) -- torch.jit baking weights into
the scripted program is the same idea.
"""

from __future__ import annotations

import jax

__all__ = ["bake_enhance"]


def bake_enhance(enhancer, params):
    """Return `enhance(noisy, lengths=None) -> enhanced` with `params`
    baked into the jitted program as compile-time constants.

    Same graph as ``jax.jit(lambda p, x, l: enhancer.apply({"params": p},
    x, l))``; only the parameter-prep subgraph becomes constant-foldable,
    so outputs match to program-recompilation tolerance (folding may
    re-associate a few f32 prep ops; observed max diff ~6e-9 on CPU --
    tests/test_serve.py pins the band). One compile per input shape, as
    usual.
    """

    @jax.jit
    def enhance(noisy, lengths=None):
        out, _ = enhancer.apply({"params": params}, noisy, lengths)
        return out

    return enhance
