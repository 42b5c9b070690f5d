"""PreconditionerNet — sparse CNN mapping tril(A) to a tril factor L.

Behavioral contract = reference ``PreconditionerNet``
(uibk/deep_preconditioning/model.py:13-59): a 1x1 conv in, kernel-2 convs
with asymmetric padding — the first half pads rows (1,0), the second half
pads cols (0,1), restoring the spatial shape — a 1x1 conv out, then the
output transform that (a) zeroes features at sites with row < col to force
lower-triangularity and (b) applies softplus on the diagonal so L has a
strictly positive diagonal, making M = L L^T SPD by construction.

TPU-native shape: the network runs over a *precomputed index plan*
(ops/sparse_conv.py) — features are a dense (nnz_pad, C) array, every layer
is K gathers + K small GEMMs, and the whole forward jits to a single XLA
program with static shapes.  Batching is an outer ``jax.vmap``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deeppreconditioning_tpu.ops.sparse_conv import (
    ConvSpec,
    LayerPlan,
    apply_sparse_conv,
)


def precond_net_specs(channels: Sequence[int]) -> List[ConvSpec]:
    """Static layer specs for a channels list (must have odd length).

    Mirrors the layer construction at model.py:27-40: 1x1 in, kernel-2
    hidden layers with padding (1,0) for the first half and (0,1) for the
    second, 1x1 out.
    """
    assert len(channels) % 2, "channels list must have odd length"
    specs = [ConvSpec((1, 1), (0, 0))]
    n_hidden = len(channels) - 3
    for index in range(n_hidden):
        padding = (1, 0) if index < (len(channels) - 2) // 2 else (0, 1)
        specs.append(ConvSpec((2, 2), padding))
    specs.append(ConvSpec((1, 1), (0, 0)))
    return specs


def _torch_conv_init(key, k: int, cin: int, cout: int, dtype):
    """Kaiming-uniform init matching torch's Conv2d default (parity with
    the reference's spconv layers)."""
    fan_in = cin * k
    bound = 1.0 / np.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (k, cin, cout), dtype, -bound, bound)
    b = jax.random.uniform(kb, (cout,), dtype, -bound, bound)
    return w, b


class PreconditionerNet(nn.Module):
    """Fully convolutional sparse net returning lower-triangular factors.

    Call signature (single sample; vmap for batches):
        features: (nnz0_pad, channels[0]) input entry values.
        plans: per-layer LayerPlans from ops.sparse_conv (list length =
            number of layers).

    Returns (nnz_out_pad,) values of L at the final plan's sites.
    """

    channels: Tuple[int, ...] = (1, 16, 32, 64, 32, 16, 1)

    @nn.compact
    def __call__(self, features: jax.Array, plans: Sequence[LayerPlan]
                 ) -> jax.Array:
        chans = self.channels
        specs = precond_net_specs(chans)
        assert len(plans) == len(specs)

        x = features
        for li, spec in enumerate(specs):
            cin, cout = chans[li], chans[li + 1]
            k = spec.kernel[0] * spec.kernel[1]
            w = self.param(
                f"w{li}",
                lambda key, sh, _k=k, _ci=cin, _co=cout: _torch_conv_init(
                    key, _k, _ci, _co, jnp.float32
                )[0],
                (k, cin, cout),
            )
            b = self.param(
                f"b{li}",
                lambda key, sh, _k=k, _ci=cin, _co=cout: _torch_conv_init(
                    key, _k, _ci, _co, jnp.float32
                )[1],
                (cout,),
            )
            x = apply_sparse_conv(x, plans[li], w, b)
            if li < len(specs) - 1:
                # PReLU with torch's default 0.25 slope init (model.py:29,37)
                alpha = self.param(
                    f"prelu{li}",
                    lambda key, sh: jnp.full(sh, 0.25, jnp.float32),
                    (1,),
                )
                x = jnp.where(x >= 0, x, alpha * x)

        # output transform (model.py:53-57): lower-tri mask + softplus diag
        final = plans[-1]
        vals = x[:, 0]
        vals = jnp.where(final.rows < final.cols, 0.0, vals)
        vals = jnp.where(
            final.rows == final.cols, jax.nn.softplus(vals), vals
        )
        return jnp.where(final.valid, vals, 0.0)


def batched_apply(model: PreconditionerNet, params, features: jax.Array,
                  plans) -> jax.Array:
    """vmap the single-sample forward over a stacked batch.

    Args:
        features: (B, nnz0_pad, C) layer-0 inputs.
        plans: tuple of batched LayerPlans (leaves have leading B).

    Returns (B, nnz_out_pad) values of L at each sample's final sites.
    """
    return jax.vmap(lambda f, p: model.apply(params, f, p))(
        features, plans
    )


def output_to_dense(values: jax.Array, final_plan, n: int) -> jax.Array:
    """Scatter batched L values to dense (B, n, n) lower-tri matrices."""
    from deeppreconditioning_tpu.metrics import scatter_tril_dense

    return scatter_tril_dense(
        values, final_plan.rows, final_plan.cols, final_plan.valid, n
    )
