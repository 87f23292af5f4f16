"""Fused Snake+Conv residual-unit stack Pallas kernel for the Oobleck VAE.

The VAE's hot path (reference architecture spec:
/root/reference/acestep/models/mlx/vae_model.py:24-120) chains residual
units of `snake -> conv1d(k=7, dilated) -> snake -> conv1d(k=1) -> +x`
three times per block with dilations (1, 3, 9). At the decoder's finest
levels (48 kHz samples, C=128) each op is memory-bound, so the XLA path
pays HBM read+write per op — ~10 tensor round-trips per stack. This
kernel computes the whole 3-unit stack in one VMEM residency:

- the length axis is blocked; each grid step loads its block plus both
  neighbors (halo = 3*(d1+d2+d3) = 39 samples < one block) and computes
  the chain entirely in VMEM/registers,
- the dilated k=7 conv is 7 shifted (BL, C) @ (C, C) MXU matmuls with
  f32 accumulation (same numerics as the XLA conv path: bf16 operands,
  f32 accumulate),
- Snake1d runs in f32 (sin/exp precision), matching models/vae.snake1d,
- sequence-edge semantics match chained 'same'-padded convs exactly:
  positions outside [0, L) are re-zeroed after every unit, reproducing
  the zero-padding each conv in the chain would have seen.

Traffic: 3 block reads + 1 write per output block (the 3x read is the
price of halo access through plain BlockSpecs) ~= 4 tensor round-trips
for the WHOLE stack vs ~10 per-op round-trips x 10 ops on the XLA path,
and the MXU matmuls land at the kernel's compute floor.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DILATIONS = (1, 3, 9)            # fixed by the architecture (res1/res2/res3)
_HALO = 3 * sum(DILATIONS)       # receptive halo of the chained stack = 39


# cos(2*pi*r) on r in [-0.5, 0.5] as a degree-6 polynomial in z = r^2
# (least-squares on Chebyshev-clustered nodes; max abs error 1.2e-6 —
# far below bf16 activation resolution). The VPU's library sin costs
# ~28 cycles/element and the snakes dominate the kernel (measured 62 ms
# of 112 ms at the 48 kHz level); this polynomial is ~10 VPU ops.
_COS2PI = (9.9999880376e-01, -1.9738972511e+01, 6.4931763898e+01,
           -8.5364105726e+01, 5.9704888277e+01, -2.4793177246e+01,
           5.3783531880e+00)


def _sin2(t: jnp.ndarray) -> jnp.ndarray:
    """sin(t)^2 = 0.5 - 0.5*cos(2t), cos by range-reduced polynomial.

    Cody-Waite two-constant reduction (pi = pi_hi + pi_lo, pi_hi exact in
    11 bits): plain `u - round(u)` loses ~|t|*ulp to cancellation, visible
    above |t| ~ 100; this keeps absolute error <2e-6 out to |t| ~ 1e4.
    """
    n = jnp.round(t * jnp.float32(1.0 / jnp.pi))
    r_t = (t - n * jnp.float32(3.140625)) - n * jnp.float32(9.6765358979e-4)
    r = r_t * jnp.float32(1.0 / jnp.pi)      # r in [-0.5, 0.5]
    z = r * r
    c = jnp.float32(_COS2PI[6])
    for k in (5, 4, 3, 2, 1, 0):
        c = c * z + jnp.float32(_COS2PI[k])
    return 0.5 - 0.5 * c


def _snake(x: jnp.ndarray, ea: jnp.ndarray, inv_eb: jnp.ndarray) -> jnp.ndarray:
    """x + (1/exp(beta)) * sin(exp(alpha) * x)^2 on f32 operands.

    `ea` = exp(alpha), `inv_eb` = 1/(exp(beta)+1e-9) are precomputed on the
    host so the kernel's VPU work is the sin^2 polynomial + fma.
    """
    return x + inv_eb * _sin2(ea * x)


def _kernel(xl_ref, xm_ref, xr_ref, w7_ref, wp_ref, b7_ref, bp_ref,
            ea_ref, ieb_ref, out_ref, *, block: int, length: int,
            dilations: Sequence[int]):
    """One grid step: compute `block` output samples of the 3-unit stack.

    Refs:
      xl/xm/xr: (1, block, C) input block and neighbors (bf16/f32)
      w7:  (3, 7, C, C) k=7 conv weights        wp: (3, C, C) k=1 weights
      b7/bp: (3, 1, C) f32 biases
      ea/ieb: (3, 2, C) f32 exp(alpha) / 1/(exp(beta)+1e-9), [unit, {pre,mid}]
      out: (1, block, C)
    """
    j = pl.program_id(1)
    halo = 3 * sum(dilations)
    dtype = xm_ref.dtype

    # f32 window carrier: slicing at the odd tap offsets relayouts the
    # buffer, and f32's 8-sublane granularity makes those shifts cheaper
    # than bf16's 16-sublane tiles (measured: bf16 carrier is ~14% slower
    # AND doubles the error vs the composed path)
    win = jnp.concatenate(
        [xl_ref[0], xm_ref[0], xr_ref[0]], axis=0
    )[block - halo: 2 * block + halo].astype(jnp.float32)
    # absolute sample index of win[0]
    start = j * block - halo

    for u, d in enumerate(dilations):
        s_in = win.shape[0]
        s_out = s_in - 6 * d
        y = _snake(win, ea_ref[u, 0][None, :], ieb_ref[u, 0][None, :])
        yb = y.astype(dtype)
        acc = jnp.broadcast_to(b7_ref[u], (s_out, y.shape[1])).astype(jnp.float32)
        for i in range(7):
            acc = acc + jnp.dot(yb[i * d: i * d + s_out], w7_ref[u, i],
                                preferred_element_type=jnp.float32)
        z = _snake(acc, ea_ref[u, 1][None, :], ieb_ref[u, 1][None, :])
        z = jnp.dot(z.astype(dtype), wp_ref[u],
                    preferred_element_type=jnp.float32) + bp_ref[u]
        out = win[3 * d: 3 * d + s_out] + z
        start = start + 3 * d
        # re-zero positions outside the real sequence: each conv in the
        # reference chain zero-pads at the TRUE sequence edges, so every
        # intermediate must be exactly 0 there before feeding the next unit
        pos = jax.lax.broadcasted_iota(jnp.int32, (s_out, 1), 0) + start
        win = jnp.where((pos >= 0) & (pos < length), out, 0.0)

    out_ref[0] = win.astype(out_ref.dtype)


def _pack_params(units, dtype):
    """Stack the 3 res-unit param dicts (models/vae.py layout) for the kernel."""
    w7 = jnp.stack([u["conv1"]["w"] for u in units]).astype(dtype)      # (3,7,C,C)
    wp = jnp.stack([u["conv2"]["w"][0] for u in units]).astype(dtype)   # (3,C,C)
    b7 = jnp.stack([u["conv1"]["b"] for u in units])[:, None].astype(jnp.float32)
    bp = jnp.stack([u["conv2"]["b"] for u in units])[:, None].astype(jnp.float32)
    ea = jnp.stack([
        jnp.stack([jnp.exp(u["snake1"]["alpha"].astype(jnp.float32)),
                   jnp.exp(u["snake2"]["alpha"].astype(jnp.float32))])
        for u in units])                                                # (3,2,C)
    ieb = jnp.stack([
        jnp.stack([1.0 / (jnp.exp(u["snake1"]["beta"].astype(jnp.float32)) + 1e-9),
                   1.0 / (jnp.exp(u["snake2"]["beta"].astype(jnp.float32)) + 1e-9)])
        for u in units])
    return w7, wp, b7, bp, ea, ieb


def _pick_block(C: int) -> int:
    # VMEM budget (~16 MB scoped): 3 double-buffered input blocks + output
    # + ~3 f32 (block+2*halo, C) intermediates + stacked weights
    if C <= 128:
        return 2048
    if C <= 256:
        return 1024
    return 512


def _composed_stack(units, x: jnp.ndarray) -> jnp.ndarray:
    """The plain-op reference chain (used by the kernel's backward pass)."""
    from acestep_tpu.models.vae import _res_unit

    for u, d in zip(units, DILATIONS):
        x = _res_unit(u, x, d)
    return x


@functools.lru_cache(maxsize=None)
def _stack_with_vjp(block, interpret):
    @jax.custom_vjp
    def f(units, x):
        return _res_unit_stack_impl(units, x, block=block,
                                    interpret=interpret)

    def fwd(units, x):
        return f(units, x), (units, x)

    def bwd(res, g):
        units, x = res
        _, vjp = jax.vjp(_composed_stack, units, x)
        return vjp(g.astype(x.dtype))

    f.defvjp(fwd, bwd)
    return f


def res_unit_stack(units, x: jnp.ndarray, *, block: int | None = None,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused 3x residual-unit stack (dilations 1/3/9) on (B, L, C).

    `units`: sequence of 3 param dicts shaped like models/vae._init_res_unit
    (keys snake1/conv1/snake2/conv2). Exact-match semantics vs applying
    models/vae._res_unit three times (chained zero-padded 'same' convs).
    Differentiable: the custom VJP recomputes through the composed XLA
    chain (the kernel itself defines no gradient; nothing in production
    differentiates VAE decode, so the recompute cost is test-only).
    """
    # units arrive as a tuple/list of dicts — pass as a tuple pytree
    return _stack_with_vjp(block, interpret)(tuple(units), x)


def _res_unit_stack_impl(units, x: jnp.ndarray, *, block: int | None = None,
                         interpret: bool = False) -> jnp.ndarray:
    assert len(units) == 3, "stack is fixed at 3 units (res1/res2/res3)"
    B, L, C = x.shape
    BL = block or _pick_block(C)
    dtype = x.dtype
    nj = -(-L // BL)
    lp = nj * BL
    # one block of zeros each side gives every grid step real neighbors
    xp = jnp.pad(x, ((0, 0), (BL, BL + lp - L), (0, 0)))

    w7, wp, b7, bp, ea, ieb = _pack_params(units, dtype)
    kernel = functools.partial(_kernel, block=BL, length=L,
                               dilations=DILATIONS)
    full = lambda *_: (0, 0, 0)
    full2 = lambda *_: (0, 0)
    out = pl.pallas_call(
        kernel,
        grid=(B, nj),
        in_specs=[
            pl.BlockSpec((1, BL, C), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, BL, C), lambda b, j: (b, j + 1, 0)),
            pl.BlockSpec((1, BL, C), lambda b, j: (b, j + 2, 0)),
            pl.BlockSpec((3, 7, C, C), lambda b, j: (0, 0, 0, 0)),
            pl.BlockSpec((3, C, C), full),
            pl.BlockSpec((3, 1, C), full),
            pl.BlockSpec((3, 1, C), full),
            pl.BlockSpec((3, 2, C), full),
            pl.BlockSpec((3, 2, C), full),
        ],
        out_specs=pl.BlockSpec((1, BL, C), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, lp, C), x.dtype),
        interpret=interpret,
    )(xp, xp, xp, w7, wp, b7, bp, ea, ieb)
    return out[:, :L]


def supported(x: jnp.ndarray, C: int) -> bool:
    """Gate: TPU backend, lane-aligned channels, length worth a kernel."""
    if jax.default_backend() != "tpu":
        return False
    # C<=256 keeps weights+activations comfortably inside VMEM (~16 MB);
    # the C>=512 levels run at 1/16th the sample rate and stay on XLA
    return C % 128 == 0 and C <= 256 and x.shape[1] >= 256
