"""Multi-chip (virtual 8-device CPU mesh) batch-sharded inference tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# slow tier: 8-device mesh trajectories (driver dryrun covers the contract)
pytestmark = pytest.mark.slow

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.pipeline.handler import AceStepHandler


def _handler(mesh_dp=None):
    h = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        dtype=jnp.float32, frame_bucket=20, min_frames=20, refer_frames=10)
    h.initialize_service(seed=0)
    if mesh_dp:
        h.enable_mesh(dp=mesh_dp)
    return h


def test_mesh_matches_single_device():
    assert len(jax.devices()) >= 4
    kw = dict(audio_duration=0.8, seeds=[1, 2, 3, 4], normalize=False)
    ref = _handler().generate_music(["a", "b", "c", "d"], ["x"] * 4, **kw)
    sharded = _handler(mesh_dp=4).generate_music(["a", "b", "c", "d"],
                                                 ["x"] * 4, **kw)
    np.testing.assert_allclose(sharded.pred_latents, ref.pred_latents,
                               rtol=2e-4, atol=2e-4)


def test_mesh_pads_indivisible_batch():
    """A served mesh accepts ANY batch size: requests not divisible by dp
    are padded with repeat rows on device and trimmed from the outputs
    (operators with --mesh must be able to serve batch-1 requests)."""
    kw = dict(audio_duration=0.8, normalize=False)
    ref = _handler().generate_music(["a", "b", "c"], ["x"] * 3,
                                    seeds=[1, 2, 3], **kw)
    h = _handler(mesh_dp=4)
    out = h.generate_music(["a", "b", "c"], ["x"] * 3, batch_size=3,
                           seeds=[1, 2, 3], **kw)
    assert len(out.audios) == 3
    assert out.pred_latents.shape[0] == 3
    assert out.seeds == [1, 2, 3]
    # extra{} lists must be trimmed to the request batch too — consumers
    # zip them with audios per item
    assert len(out.extra["spans"]) == 3
    assert len(out.extra["is_covers"]) == 3
    np.testing.assert_allclose(out.pred_latents, ref.pred_latents,
                               rtol=2e-4, atol=2e-4)


def test_mesh_pads_per_row_initial_noise():
    """Per-row initial_noise on an indivisible batch must cycle with the
    dp padding (B_req=3 -> B=4) exactly like captions/seeds do."""
    rng = np.random.default_rng(0)
    noise = rng.standard_normal((3, 20, 64)).astype(np.float32)
    kw = dict(audio_duration=0.8, normalize=False, seeds=[1, 2, 3])
    ref = _handler().generate_music(["a", "b", "c"], ["x"] * 3,
                                    initial_noise=noise, **kw)
    out = _handler(mesh_dp=4).generate_music(["a", "b", "c"], ["x"] * 3,
                                             batch_size=3,
                                             initial_noise=noise, **kw)
    assert out.pred_latents.shape[0] == 3
    np.testing.assert_allclose(out.pred_latents, ref.pred_latents,
                               rtol=2e-4, atol=2e-4)


def test_enable_mesh_too_many_devices():
    h = _handler()
    with pytest.raises(ValueError):
        h.enable_mesh(dp=4096)


def test_lm_tensor_parallel_matches_single():
    """TP-sharded Qwen3 decode == unsharded (virtual CPU mesh)."""
    from acestep_tpu.llm.handler import LLMHandler

    a = LLMHandler()
    a.initialize(seed=0)
    b = LLMHandler()
    b.initialize(seed=0, tensor_parallel=2)

    # tiny cfg heads must divide tp=2 — verify assumption
    assert a.cfg.num_key_value_heads % 2 == 0

    ca = a.engine.generate_codes(["make music"], n_codes=10, seed=5,
                                 temperature=0.7)
    cb = b.engine.generate_codes(["make music"], n_codes=10, seed=5,
                                 temperature=0.7)
    assert ca == cb


def test_lm_tensor_parallel_w8a8_head_q_sharded():
    """w8a8 + tp: the int8 output head (the largest per-step decode read)
    must be vocab-sharded like the tied embed head, and decode must still
    match the unsharded engine."""
    from acestep_tpu.llm.handler import LLMHandler

    # num_fallback_codes=65 -> even vocab (167 with 64 codes is odd and
    # sanitize_pspecs would rightly replicate it under tp=2; the real
    # 215936-token vocab divides any tp)
    a = LLMHandler()
    a.initialize(seed=0, quantization="w8a8", num_fallback_codes=65)
    b = LLMHandler()
    b.initialize(seed=0, tensor_parallel=2, quantization="w8a8",
                 num_fallback_codes=65)

    hq = b.engine.params.get("head_q")
    assert hq is not None
    specs = {k: v.sharding.spec for k, v in hq.items()}
    assert specs["q"][0] is not None, "head_q.q replicated under tp"
    assert specs["scale"][0] is not None, "head_q.scale replicated under tp"

    ca = a.engine.generate_codes(["make music"], n_codes=10, seed=5,
                                 temperature=0.7)
    cb = b.engine.generate_codes(["make music"], n_codes=10, seed=5,
                                 temperature=0.7)
    assert ca == cb


def test_initial_noise_seam():
    """Externally-supplied noise makes trajectories reproducible across
    RNG implementations (the seed-parity seam)."""
    h = _handler()
    rng = np.random.default_rng(0)
    noise = rng.standard_normal((20, 64)).astype(np.float32)
    kw = dict(audio_duration=0.8, normalize=False)
    a = h.generate_music("song", "x", initial_noise=noise, seeds=1, **kw)
    b = h.generate_music("song", "x", initial_noise=noise, seeds=999, **kw)
    # same noise -> identical latents regardless of seed
    np.testing.assert_array_equal(a.pred_latents, b.pred_latents)
    c = h.generate_music("song", "x", seeds=1, **kw)
    assert not np.allclose(a.pred_latents, c.pred_latents)


def test_mesh_dp_tp_matches_single_device():
    """dp=2 x tp=2 DiT inference (params sharded head-/column-wise,
    batch sharded) matches the single-device trajectory. The reference
    declares this TP plan but never executes it."""
    assert len(jax.devices()) >= 4
    kw = dict(audio_duration=0.8, seeds=[1, 2], normalize=False)
    ref = _handler().generate_music(["a", "b"], ["x", "y"], **kw)
    h = _handler()
    h.enable_mesh(dp=2, tp=2)
    sharded = h.generate_music(["a", "b"], ["x", "y"], **kw)
    np.testing.assert_allclose(sharded.pred_latents, ref.pred_latents,
                               rtol=2e-4, atol=2e-4)


def test_mesh_tp_only_single_item():
    """tp=4, dp=1: one song's denoising spread over 4 chips."""
    h = _handler()
    h.enable_mesh(dp=1, tp=4)
    res = h.generate_music(["solo"], ["x"], audio_duration=0.8, seeds=[7],
                           normalize=False)
    ref = _handler().generate_music(["solo"], ["x"], audio_duration=0.8,
                                    seeds=[7], normalize=False)
    np.testing.assert_allclose(res.pred_latents, ref.pred_latents,
                               rtol=2e-4, atol=2e-4)


def test_quantized_params_get_tp_sharding_specs():
    """TP specs must reach through quant nodes ({int8/fp8 payload, scale}
    replacing 'w') — regression: quantized models silently replicated."""
    from acestep_tpu.models.dit import init_dit_params
    from acestep_tpu.ops.quant import quantize_tree
    from acestep_tpu.parallel import dit_param_pspecs
    from jax.sharding import PartitionSpec as P

    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_tree(params, "w8a8")
    specs = dit_param_pspecs(qparams)

    def find(tree, *keys):
        for k in keys:
            tree = tree[k]
        return tree

    layer_q = find(specs, "decoder", "layers", "self_attn", "q_proj", "w")
    assert isinstance(layer_q, dict), "q_proj.w should be a quant node"
    payload_specs = [v for k, v in layer_q.items() if k != "scale"]
    assert payload_specs and all("tp" in str(s) for s in payload_specs), \
        payload_specs
    assert "tp" in str(layer_q["scale"])      # col-parallel: out dim sharded
    o_proj = find(specs, "decoder", "layers", "self_attn", "o_proj", "w")
    assert o_proj["scale"] == P()             # row-parallel scale replicated
    payload = [v for k, v in o_proj.items() if k != "scale"][0]
    assert "tp" in str(payload)


def test_quantized_model_tp_matches_single_device():
    """w8a8-quantized DiT under dp x tp must generate (and match the
    unsharded quantized model) — regression: quant nodes were replicated,
    and any spec/layout mismatch would surface here as a compile error."""
    def q_handler(mesh=False):
        h = AceStepHandler(
            dit_config=DiTConfig.tiny(fsq_dim=64),
            vae_config=VAEConfig.tiny(decoder_input_channels=64),
            dtype=jnp.float32, frame_bucket=20, min_frames=20,
            refer_frames=10)
        h.initialize_service(seed=0, quantization="w8a8")
        if mesh:
            h.enable_mesh(dp=2, tp=2)
        return h

    kw = dict(audio_duration=0.8, seeds=[1, 2], normalize=False)
    ref = q_handler().generate_music(["a", "b"], ["x"] * 2, **kw)
    sharded = q_handler(mesh=True).generate_music(["a", "b"], ["x"] * 2, **kw)
    np.testing.assert_allclose(sharded.pred_latents, ref.pred_latents,
                               rtol=2e-4, atol=2e-4)
