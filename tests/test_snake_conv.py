"""Fused snake+conv res-unit stack kernel vs the composed XLA reference path.

The kernel must match applying models/vae._res_unit three times exactly
(chained zero-padded 'same' convs), including sequence-edge semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acestep_tpu.models.vae import _init_res_unit, _res_unit
from acestep_tpu.ops.snake_conv import DILATIONS, res_unit_stack


def _mk_units(key, C):
    ks = jax.random.split(key, 3)
    units = [_init_res_unit(ks[i], C, d) for i, d in enumerate(DILATIONS)]
    # non-trivial snake params (init is zeros -> exp=1); randomize
    k2 = jax.random.split(key, 12)
    idx = 0
    for u in units:
        for sn in ("snake1", "snake2"):
            u[sn]["alpha"] = 0.3 * jax.random.normal(k2[idx], u[sn]["alpha"].shape)
            u[sn]["beta"] = 0.3 * jax.random.normal(k2[idx + 1], u[sn]["beta"].shape)
            idx += 2
    return units


def _reference(units, x):
    for u, d in zip(units, DILATIONS):
        x = _res_unit(u, x, d)
    return x


@pytest.mark.parametrize("B,L,C,block", [
    (1, 300, 128, 128),      # L not a block multiple; edge blocks exercised
    (2, 512, 128, 128),
    (1, 257, 256, 128),      # odd length
])
@pytest.mark.slow
def test_matches_composed_res_units(B, L, C, block):
    key = jax.random.PRNGKey(0)
    units = _mk_units(key, C)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, C), jnp.float32)
    ref = _reference(units, x)
    got = res_unit_stack(units, x, block=block, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sin2_polynomial_accuracy():
    """The range-reduced degree-6 polynomial must track sin^2 to <2e-6
    over a wide argument range (snake inputs are exp(alpha)*activation)."""
    from acestep_tpu.ops.snake_conv import _sin2

    t = jnp.asarray(np.linspace(-2000.0, 2000.0, 400001), jnp.float32)
    got = np.asarray(_sin2(t))
    want = np.sin(np.asarray(t, np.float64)) ** 2
    assert np.abs(got - want).max() < 2e-6


@pytest.mark.slow
def test_kernel_is_differentiable_via_composed_vjp():
    """grad(res_unit_stack) must equal grad of the composed chain (the
    custom VJP recomputes through the plain ops)."""
    key = jax.random.PRNGKey(5)
    C, L = 128, 256
    units = _mk_units(key, C)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, L, C), jnp.float32)

    def loss_kernel(x):
        return jnp.sum(res_unit_stack(units, x, block=128, interpret=True) ** 2)

    def loss_ref(x):
        return jnp.sum(_reference(units, x) ** 2)

    gk = np.asarray(jax.grad(loss_kernel)(x))
    gr = np.asarray(jax.grad(loss_ref)(x))
    np.testing.assert_allclose(gk, gr, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_bf16_close_to_f32_reference():
    key = jax.random.PRNGKey(2)
    C, L = 128, 384
    units = _mk_units(key, C)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, L, C), jnp.float32)
    ref = _reference(units, x)
    got = res_unit_stack(
        jax.tree.map(lambda a: a.astype(jnp.bfloat16), units),
        x.astype(jnp.bfloat16), block=128, interpret=True)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref))
    rel = err.max() / (np.abs(np.asarray(ref)).max() + 1e-6)
    assert rel < 0.05, rel
