"""Oobleck VAE tests: geometry, determinism, tiled == direct in the interior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acestep_tpu.config import VAEConfig
from acestep_tpu.models.vae import init_vae_params, vae_decode, vae_encode, vae_encode_moments
from acestep_tpu.models.vae_tiled import tiled_decode, tiled_encode


@pytest.fixture(scope="module")
def vae():
    cfg = VAEConfig.tiny()          # hop = 8
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    return params, cfg


@pytest.mark.slow
def test_encode_decode_geometry(vae):
    params, cfg = vae
    hop = cfg.hop_length
    assert hop == 8
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, 40 * hop, cfg.audio_channels))
    mean, std = vae_encode_moments(params, cfg, audio)
    assert mean.shape == (2, 40, cfg.decoder_input_channels)
    assert std.shape == mean.shape
    assert bool(jnp.all(std > 0))
    out = vae_decode(params, cfg, mean)
    assert out.shape == (2, 40 * hop, cfg.audio_channels)


def test_full_size_config_hop():
    cfg = VAEConfig()
    assert cfg.hop_length == 1920
    assert cfg.sampling_rate // cfg.hop_length == 25


@pytest.mark.slow
def test_encode_sampling_deterministic(vae):
    params, cfg = vae
    audio = jax.random.normal(jax.random.PRNGKey(2), (1, 64 * cfg.hop_length, 2))
    z1 = vae_encode(params, cfg, audio, key=jax.random.PRNGKey(7))
    z2 = vae_encode(params, cfg, audio, key=jax.random.PRNGKey(7))
    z3 = vae_encode(params, cfg, audio)  # mean, no noise
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert not np.allclose(np.asarray(z1), np.asarray(z3))


@pytest.mark.slow
def test_tiled_decode_matches_direct_interior(vae):
    params, cfg = vae
    hop = cfg.hop_length
    T = 50
    latents = jax.random.normal(jax.random.PRNGKey(3), (1, T, cfg.decoder_input_channels))
    direct = np.asarray(vae_decode(params, cfg, latents))
    tiled = np.asarray(tiled_decode(params, cfg, latents, chunk_size=16, overlap=4))
    assert tiled.shape == direct.shape
    # Interior (away from signal edges) must match to float tolerance.
    lo, hi = 8 * hop, (T - 8) * hop
    np.testing.assert_allclose(tiled[:, lo:hi], direct[:, lo:hi], atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_tiled_decode_short_input_is_direct(vae):
    params, cfg = vae
    latents = jax.random.normal(jax.random.PRNGKey(4), (1, 10, cfg.decoder_input_channels))
    direct = np.asarray(vae_decode(params, cfg, latents))
    tiled = np.asarray(tiled_decode(params, cfg, latents, chunk_size=16, overlap=4))
    np.testing.assert_array_equal(tiled, direct)


@pytest.mark.slow
def test_tiled_encode_matches_direct_interior(vae):
    params, cfg = vae
    hop = cfg.hop_length
    T = 64
    audio = jax.random.normal(jax.random.PRNGKey(5), (2, T * hop, cfg.audio_channels))
    direct = np.asarray(vae_encode(params, cfg, audio))
    tiled = np.asarray(tiled_encode(params, cfg, audio, chunk_size=16, overlap=4))
    assert tiled.shape == direct.shape
    np.testing.assert_allclose(tiled[:, 8:-8], direct[:, 8:-8], atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_tiled_encode_unaligned_length_pads(vae):
    params, cfg = vae
    hop = cfg.hop_length
    audio = jax.random.normal(jax.random.PRNGKey(6), (1, 33 * hop + 5, cfg.audio_channels))
    z = tiled_encode(params, cfg, audio, chunk_size=16, overlap=4)
    assert z.shape == (1, 34, cfg.decoder_input_channels)


@pytest.mark.slow
def test_tiled_invalid_overlap_degrades(vae):
    """chunk_size <= 2*overlap would give a non-positive stride: both tiled
    paths halve the overlap until valid (reference's adaptive-overlap
    guard, vae_encode_chunks/vae_decode_chunks tests)."""
    import numpy as np

    from acestep_tpu.models.vae_tiled import tiled_decode, tiled_encode

    params, cfg = vae
    hop = cfg.hop_length
    audio = jnp.asarray(
        np.random.RandomState(0).randn(1, 40 * hop, 2), jnp.float32)
    z = tiled_encode(params, cfg, audio, chunk_size=8, overlap=8,
                     parallel_windows=2)
    assert z.shape[1] == 40
    out = tiled_decode(params, cfg, z, chunk_size=8, overlap=8,
                       parallel_windows=2)
    assert out.shape[1] == 40 * hop
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_decode_jit_and_grad(vae):
    """Decoder is jittable and differentiable (training path uses encode grads)."""
    params, cfg = vae
    latents = jax.random.normal(jax.random.PRNGKey(8), (1, 16, cfg.decoder_input_channels))

    @jax.jit
    def loss(p):
        return jnp.mean(vae_decode(p, cfg, latents) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
