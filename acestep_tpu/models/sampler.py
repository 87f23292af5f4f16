"""Flow-matching samplers compiled as a single `lax.scan`.

Turbo: discrete 8-step shift schedules (ref modeling_acestep_v15_turbo.py
:1780-2001 — SHIFT_TIMESTEPS/VALID_TIMESTEPS :1807-1823, ODE Euler / SDE
renoise updates, final-step x0 = z - v*t).

Base/SFT: continuous linspace schedule with shift warp t <- s*t/(1+(s-1)t)
and classifier-free guidance by batch doubling, guided by APG (momentum +
orthogonal projection) or ADG (ref models/base/modeling_acestep_v15_base.py
:1783-1989, models/base/apg_guidance.py).

Cross-attention K/V over the condition sequence are precomputed once and
closed over by the scan — the whole trajectory is one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from acestep_tpu.config import DiTConfig
from acestep_tpu.constants import SHIFT_TIMESTEPS, VALID_SHIFTS, VALID_TIMESTEPS
from acestep_tpu.models.dit import decoder_cross_kv, dit_decoder

# ------------------------------------------------------------------
# Schedules (host-side, static)
# ------------------------------------------------------------------


def build_turbo_schedule(shift: float = 3.0,
                         timesteps: Optional[Sequence[float]] = None):
    """Resolve the discrete turbo schedule: custom timesteps snap to the
    nearest of the 20 valid values; otherwise shift snaps to {1,2,3}
    (ref :1826-1865)."""
    if timesteps is not None:
        ts = [float(t) for t in timesteps]
        while ts and ts[-1] == 0:
            ts.pop()
        if len(ts) > 20:
            ts = ts[:20]
        if ts:
            return [min(VALID_TIMESTEPS, key=lambda v: abs(v - t)) for t in ts]
    s = min(VALID_SHIFTS, key=lambda v: abs(v - shift))
    return list(SHIFT_TIMESTEPS[s])


def build_continuous_schedule(infer_steps: int, shift: float = 1.0):
    """linspace(1,0,steps+1) with shift warp (ref base :1864-1867).
    Returns steps+1 values ending at 0.

    HOST numpy on purpose: the jnp version put one tiny array on device and
    then fetched 51 scalars one float() at a time — ~1 tunnel RTT each,
    a measured 1.7-2.5 s of pure dispatch latency per 50-step request
    (the base50 'unaccounted service overhead', VERDICT r4 item 2)."""
    import numpy as np

    # float32 like the jnp/torch versions: keeps the schedule values (and
    # with them the jit cache keys + reference parity) bit-identical
    t = np.linspace(1.0, 0.0, infer_steps + 1, dtype=np.float32)
    if shift != 1.0:
        t = np.float32(shift) * t / (1 + (np.float32(shift) - 1) * t)
    return [float(v) for v in t]


def truncate_for_cover_noise(schedule, cover_noise_strength: float):
    """Start the trajectory from the nearest timestep to
    1 - cover_noise_strength (ref :1922-1936). Returns (schedule', start_t)
    where start_t is None when no truncation happens."""
    if cover_noise_strength <= 0.0:
        return list(schedule), None
    effective = 1.0 - cover_noise_strength
    body = list(schedule[:-1]) if schedule[-1] == 0.0 else list(schedule)
    nearest = min(body, key=lambda v: abs(v - effective))
    idx = body.index(nearest)
    out = list(schedule[idx:])
    return out, nearest


# ------------------------------------------------------------------
# Guidance (APG / ADG), carried through the scan
# ------------------------------------------------------------------


def apg_step(pred_cond, pred_uncond, running_avg, *, guidance_scale: float,
             momentum: float = -0.75, eta: float = 0.0,
             norm_threshold: float = 2.5):
    """One APG update (ref apg_guidance.py:33-56). dims=[1] == time axis of
    (B, T, C). Returns (guided, new_running_avg)."""
    f32 = jnp.float32
    diff = pred_cond.astype(f32) - pred_uncond.astype(f32)
    running = diff + momentum * running_avg
    d = running
    if norm_threshold > 0:
        n = jnp.linalg.norm(d, axis=1, keepdims=True)
        d = d * jnp.minimum(1.0, norm_threshold / n)
    v1 = pred_cond.astype(f32)
    # torch F.normalize clamps the denominator at eps=1e-12; an unguarded
    # division turns an all-zero column (dead quantized channel) into NaN
    v1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=1, keepdims=True), 1e-12)
    parallel = jnp.sum(d * v1, axis=1, keepdims=True) * v1
    orthogonal = d - parallel
    update = orthogonal + eta * parallel
    guided = pred_cond.astype(f32) + (guidance_scale - 1) * update
    return guided.astype(pred_cond.dtype), running


def adg_step(latents, pred_cond, pred_uncond, sigma, *, guidance_scale: float,
             angle_clip: float = 3.14 / 6, apply_norm: bool = False,
             apply_clip: bool = True):
    """Angle-based Dynamic Guidance (ref apg_guidance.py:107-180)."""
    f32 = jnp.float32
    x = latents.astype(f32)
    vc = pred_cond.astype(f32)
    vu = pred_uncond.astype(f32)
    n, t, c = vc.shape
    sigma = jnp.reshape(sigma, (-1, 1, 1)).astype(f32)
    sigma = jnp.broadcast_to(sigma, (n, 1, 1))

    weight = guidance_scale - 1
    weight = weight * (weight > 0) + 1e-3

    hat_c = x - sigma * vc
    hat_u = x - sigma * vu
    diff = hat_c - hat_u

    def _unit(v):
        return v / jnp.linalg.norm(v, axis=1, keepdims=True)

    flat_c = hat_c.reshape(-1, c)
    flat_u = hat_u.reshape(-1, c)
    cos = jnp.sum(_unit(flat_c) * _unit(flat_u), axis=1, keepdims=True)
    theta = jnp.arccos(jnp.clip(cos, -1.0, 1.0))
    theta_new = jnp.clip(weight * theta, -angle_clip, angle_clip) if apply_clip \
        else weight * theta

    fd = diff.reshape(-1, c)
    fu = hat_u.reshape(-1, c)
    dot = jnp.sum(fd * fu, axis=1, keepdims=True)
    nrm = jnp.sum(fu * fu, axis=1, keepdims=True)
    proj = (dot / (nrm + 1e-8)) * fu
    perp = (fd - proj).reshape(n, t, c)
    theta = theta.reshape(n * t, 1)
    theta_new = theta_new.reshape(n * t, 1)

    v_new = jnp.cos(theta_new).reshape(n, t, 1) * hat_c
    sin_t = jnp.sin(theta)
    ratio = jnp.where(sin_t > 1e-3, jnp.sin(theta_new) / jnp.where(sin_t > 1e-3, sin_t, 1.0), weight)
    p_new = perp * ratio.reshape(n, t, 1)
    latent_new = v_new + p_new
    if apply_norm:
        latent_new = latent_new * jnp.linalg.norm(hat_c, axis=1, keepdims=True) \
            / jnp.linalg.norm(latent_new, axis=1, keepdims=True)
    out = (x - latent_new) / sigma
    return out.astype(pred_cond.dtype)


# ------------------------------------------------------------------
# Condition bundle
# ------------------------------------------------------------------


@dataclasses.dataclass
class ConditionSet:
    """Precompiled condition: per-layer cross K/V + context latents."""
    cross_kv: tuple          # stacked (n_layers, B, Lk, Hkv, D) k and v
    context_latents: jnp.ndarray

    @classmethod
    def build(cls, params, cfg: DiTConfig, enc, context_latents):
        return cls(decoder_cross_kv(params, cfg, enc), context_latents)


def _select_condition(a: ConditionSet, b: Optional[ConditionSet], use_a):
    if b is None:
        return a.cross_kv, a.context_latents
    kv = jax.tree.map(lambda x, y: jnp.where(use_a, x, y), a.cross_kv, b.cross_kv)
    ctx = jnp.where(use_a, a.context_latents, b.context_latents)
    return kv, ctx


# ------------------------------------------------------------------
# Samplers
# ------------------------------------------------------------------


def get_x0_from_noise(zt, vt, t):
    return zt - vt * jnp.reshape(t, (-1, 1, 1)).astype(zt.dtype)


def renoise(x, t, noise):
    t = jnp.asarray(t, x.dtype)
    t = t if t.ndim == x.ndim else jnp.reshape(t, (-1,) + (1,) * (x.ndim - 1))
    return t * noise + (1 - t) * x


def sample_turbo(params, cfg: DiTConfig, *,
                 x_init: jnp.ndarray,
                 schedule: Sequence[float],
                 cond: ConditionSet,
                 cond_non_cover: Optional[ConditionSet] = None,
                 cover_steps: Optional[int] = None,
                 infer_method: str = "ode",
                 key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Discrete-schedule sampler (turbo). `schedule` lists the visited
    timesteps (no trailing 0); the final step computes x0 directly."""
    n = len(schedule)
    ts = jnp.asarray(list(schedule) + [0.0], dtype=x_init.dtype)
    bsz = x_init.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    cover_cut = n if cover_steps is None else cover_steps

    def step(carry, i):
        xt, k = carry
        t = ts[i]
        t_next = ts[i + 1]
        t_vec = jnp.full((bsz,), t, x_init.dtype)
        kv, ctx = _select_condition(cond, cond_non_cover, i < cover_cut)
        vt = dit_decoder(params, cfg, xt, t_vec, t_vec, ctx, cross_kv_cache=kv)

        # both updates reduce to x0 exactly when t_next == 0 (the final
        # step), so no is_last special case is needed:
        # ODE: xt - vt*(t-0) == get_x0_from_noise; SDE: renoise(x0, 0, .) == x0
        if infer_method == "sde":
            k, sub = jax.random.split(k)
            noise = jax.random.normal(sub, xt.shape, xt.dtype)
            xt = renoise(get_x0_from_noise(xt, vt, t_vec), t_next, noise)
        else:
            xt = xt - vt * (t - t_next)
        return (xt, k), None

    (x, _), _ = jax.lax.scan(step, (x_init, key), jnp.arange(n))
    return x


def sample_guided(params, cfg: DiTConfig, *,
                  x_init: jnp.ndarray,
                  schedule: Sequence[float],
                  cond: ConditionSet,
                  null_cond: Optional[ConditionSet],
                  cond_non_cover: Optional[ConditionSet] = None,
                  null_cond_non_cover: Optional[ConditionSet] = None,
                  cover_steps: Optional[int] = None,
                  guidance_scale: float = 7.0,
                  cfg_interval: tuple = (0.0, 1.0),
                  use_adg: bool = False,
                  infer_method: str = "ode",
                  key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Continuous-schedule CFG sampler (base/sft). `schedule` has steps+1
    values ending at 0. CFG doubles the batch along axis 0; guidance is APG
    (with a momentum buffer carried across steps) or ADG, gated by
    cfg_interval on t (ref base :1905-1966)."""
    do_cfg = guidance_scale > 1.0 and null_cond is not None
    n = len(schedule) - 1
    ts = jnp.asarray(schedule, dtype=x_init.dtype)
    bsz = x_init.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    cover_cut = n if cover_steps is None else cover_steps

    def batched_condition(i):
        kv_c, ctx_c = _select_condition(cond, cond_non_cover, i < cover_cut)
        if not do_cfg:
            return kv_c, ctx_c
        kv_u, ctx_u = _select_condition(null_cond, null_cond_non_cover, i < cover_cut)
        kv = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=1), kv_c, kv_u)
        ctx = jnp.concatenate([ctx_c, ctx_u], axis=0)
        return kv, ctx

    # without a cover switch the [cond; null] cross-KV concat is loop-
    # invariant — build the doubled trees ONCE outside the scan instead of
    # copying the full per-layer K/V stacks on all `n` steps
    static_kv_ctx = None
    if cond_non_cover is None and null_cond_non_cover is None:
        static_kv_ctx = batched_condition(jnp.zeros((), jnp.int32))

    def step(carry, i):
        xt, momentum, k = carry
        t = ts[i]
        t_next = ts[i + 1]
        kv, ctx = static_kv_ctx if static_kv_ctx is not None \
            else batched_condition(i)
        if do_cfg:
            x_in = jnp.concatenate([xt, xt], axis=0)
            t_vec = jnp.full((2 * bsz,), t, x_init.dtype)
        else:
            x_in = xt
            t_vec = jnp.full((bsz,), t, x_init.dtype)
        v = dit_decoder(params, cfg, x_in, t_vec, t_vec, ctx, cross_kv_cache=kv)
        if do_cfg:
            v_cond, v_uncond = jnp.split(v, 2, axis=0)
            in_interval = (t >= cfg_interval[0]) & (t <= cfg_interval[1])
            if use_adg:
                v_guided = adg_step(xt, v_cond, v_uncond, t,
                                    guidance_scale=guidance_scale)
                new_momentum = momentum
            else:
                v_guided, new_momentum = apg_step(
                    v_cond, v_uncond, momentum, guidance_scale=guidance_scale)
            vt = jnp.where(in_interval, v_guided, v_cond)
            momentum = jnp.where(in_interval & (not use_adg), new_momentum, momentum)
        else:
            vt = v

        if infer_method == "sde":
            k, sub = jax.random.split(k)
            noise = jax.random.normal(sub, xt.shape, xt.dtype)
            t_b = jnp.full((bsz,), t, x_init.dtype)
            # the reference renoises at the UNSHIFTED linear timestep
            # 1-(i+1)/n (base :1972, with infer_steps reassigned to the
            # truncated count after cover-noise), NOT the shift-warped
            # schedule value — they only coincide at shift=1
            lin_next = 1.0 - (i + 1).astype(x_init.dtype) / n
            xt = renoise(get_x0_from_noise(xt, vt, t_b), lin_next, noise)
        else:
            xt = xt - vt * (t - t_next)
        return (xt, momentum, k), None

    momentum0 = jnp.zeros(x_init.shape, jnp.float32)
    (x, _, _), _ = jax.lax.scan(step, (x_init, momentum0, key), jnp.arange(n))
    return x
