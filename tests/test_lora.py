"""LoRA/LoKr adapter + manager + trainer tests (tiny geometry, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acestep_tpu.config import DiTConfig
from acestep_tpu.lora import (
    init_lokr,
    init_lora,
    merge_adapter,
    target_paths,
)
from acestep_tpu.lora.manager import LoraManager, load_adapter_file, save_adapter
from acestep_tpu.models.dit import init_dit_params


@pytest.fixture(scope="module")
def tiny():
    cfg = DiTConfig.tiny()
    params = init_dit_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_init_lora_shapes_and_zero_delta(tiny):
    cfg, params = tiny
    adapter = init_lora(jax.random.PRNGKey(1), params, rank=4)
    targets = target_paths(params)
    assert set(adapter["weights"]) == set(targets)
    for name, w in targets.items():
        L, d_in, d_out = w.shape
        assert adapter["weights"][name]["down"].shape == (L, d_in, 4)
        assert adapter["weights"][name]["up"].shape == (L, 4, d_out)
    # up is zeros => merged == base exactly
    merged = merge_adapter(params, adapter, scale=1.0)
    for name, w in target_paths(merged).items():
        np.testing.assert_array_equal(np.asarray(w),
                                      np.asarray(targets[name]))


def test_merge_changes_only_targets(tiny):
    cfg, params = tiny
    adapter = init_lora(jax.random.PRNGKey(1), params, rank=4)
    # make delta nonzero
    name = "self_attn.q_proj"
    adapter["weights"][name]["up"] = jnp.ones_like(
        adapter["weights"][name]["up"]) * 0.01
    merged = merge_adapter(params, adapter, scale=0.5)
    base_t = target_paths(params)
    merged_t = target_paths(merged)
    assert not np.allclose(np.asarray(merged_t[name]),
                           np.asarray(base_t[name]))
    # other targets untouched
    np.testing.assert_array_equal(
        np.asarray(merged_t["mlp.down"]), np.asarray(base_t["mlp.down"]))
    # non-target trees untouched (object identity preserved)
    assert merged["encoder"] is params["encoder"]
    # scale linearity: delta(scale=1) == 2 * delta(scale=0.5)
    merged1 = merge_adapter(params, adapter, scale=1.0)
    d_half = np.asarray(merged_t[name]) - np.asarray(base_t[name])
    d_full = np.asarray(target_paths(merged1)[name]) - np.asarray(base_t[name])
    np.testing.assert_allclose(d_full, 2 * d_half, rtol=1e-5, atol=1e-7)


def test_lokr_kron_shapes(tiny):
    cfg, params = tiny
    adapter = init_lokr(jax.random.PRNGKey(2), params, factor=4)
    merged = merge_adapter(params, adapter, scale=1.0)   # b zeros -> identity
    for name, w in target_paths(merged).items():
        np.testing.assert_array_equal(np.asarray(w),
                                      np.asarray(target_paths(params)[name]))
    # nonzero b gives nonzero delta of the right shape
    name = "mlp.gate"
    adapter["weights"][name]["b"] = jnp.ones_like(
        adapter["weights"][name]["b"])
    merged = merge_adapter(params, adapter, scale=1.0)
    assert not np.allclose(np.asarray(target_paths(merged)[name]),
                           np.asarray(target_paths(params)[name]))


def test_save_load_roundtrip(tiny, tmp_path):
    cfg, params = tiny
    adapter = init_lora(jax.random.PRNGKey(3), params, rank=2)
    path = str(tmp_path / "a.npz")
    save_adapter(path, {"meta": adapter["meta"],
                        "weights": jax.tree.map(np.asarray,
                                                adapter["weights"])})
    loaded = load_adapter_file(path)
    assert loaded["meta"] == adapter["meta"]
    for name in adapter["weights"]:
        np.testing.assert_array_equal(
            np.asarray(loaded["weights"][name]["down"]),
            np.asarray(adapter["weights"][name]["down"]))


def test_manager_lifecycle(tiny, tmp_path):
    cfg, params = tiny
    manager = LoraManager(params)
    # no adapter -> base identity
    assert manager.effective_params() is params

    adapter = init_lora(jax.random.PRNGKey(4), params, rank=2)
    adapter["weights"]["self_attn.q_proj"]["up"] = jnp.ones_like(
        adapter["weights"]["self_attn.q_proj"]["up"]) * 0.1
    path = str(tmp_path / "b.npz")
    save_adapter(path, {"meta": adapter["meta"],
                        "weights": jax.tree.map(np.asarray,
                                                adapter["weights"])})

    info = manager.load(path, adapter_name="style_a", scale=0.7)
    assert info["adapter_name"] == "style_a"
    effective = manager.effective_params()
    assert not np.allclose(
        np.asarray(target_paths(effective)["self_attn.q_proj"]),
        np.asarray(target_paths(params)["self_attn.q_proj"]))

    status = manager.status()
    assert status["active_adapter"] == "style_a"
    assert status["adapters"][0]["scale"] == 0.7

    manager.toggle(False)
    assert manager.effective_params() is params
    manager.toggle(True)

    manager.set_scale(0.0, "style_a")
    eff0 = manager.effective_params()
    np.testing.assert_allclose(
        np.asarray(target_paths(eff0)["self_attn.q_proj"]),
        np.asarray(target_paths(params)["self_attn.q_proj"]), atol=1e-7)

    out = manager.unload("style_a")
    assert out["unloaded"] == "style_a"
    assert manager.effective_params() is params


def test_manager_signature_tracks_adapters_and_scales(tiny, tmp_path):
    """Output uuids embed the LoRA state (reference audio_utils_uuid_test):
    different adapters or scales -> different signatures; disabled -> ''."""
    cfg, params = tiny
    mgr = LoraManager(params)
    assert mgr.signature() == ""
    adapter = init_lora(jax.random.PRNGKey(0), params, rank=2)
    path = str(tmp_path / "sig.npz")
    save_adapter(path, {"meta": adapter["meta"],
                        "weights": jax.tree.map(np.asarray,
                                                adapter["weights"])})
    mgr.load(path, adapter_name="styleA")
    sig_a = mgr.signature()
    assert "styleA" in sig_a
    mgr.set_scale(0.5, adapter_name="styleA")
    assert mgr.signature() != sig_a          # scale changes the signature
    mgr.toggle(False)
    assert mgr.signature() == ""             # disabled state signs empty


def test_lycoris_lokr_import(tmp_path):
    """LyCORIS lokr_w1/lokr_w2 safetensors (the reference's trained-LoKr
    format, lokr_utils.save_lokr_weights) import as our stacked (in,out)
    Kronecker factors with the correct delta orientation; unrecognized
    formats fail loudly instead of producing an empty no-op adapter."""
    from safetensors.numpy import save_file

    from acestep_tpu.lora.adapters import lokr_delta
    from acestep_tpu.lora.manager import load_adapter_file

    rng = np.random.default_rng(0)
    w1 = rng.standard_normal((2, 4)).astype(np.float32)    # (o1, i1)
    w2a = rng.standard_normal((8, 3)).astype(np.float32)
    w2b = rng.standard_normal((3, 4)).astype(np.float32)   # w2 = w2a@w2b
    tensors = {
        # underscore-mangled module names, as LyCORIS emits them
        "lycoris_base_layers_0_self_attn_q_proj.lokr_w1": w1,
        "lycoris_base_layers_0_self_attn_q_proj.lokr_w2_a": w2a,
        "lycoris_base_layers_0_self_attn_q_proj.lokr_w2_b": w2b,
        "lycoris_base_layers_0_self_attn_q_proj.alpha":
            np.asarray(1.0, np.float32),
    }
    path = str(tmp_path / "lokr_weights.safetensors")
    save_file(tensors, path)
    adapter = load_adapter_file(path)
    assert adapter["meta"]["kind"] == "lokr"
    aw = adapter["weights"]["self_attn.q_proj"]
    assert aw["a"].shape == (1, 4, 2) and aw["b"].shape == (1, 4, 8)
    # delta equals the torch-oriented kron, transposed to (in, out), at
    # the LyCORIS scale alpha/rank (w2 factored at rank 3, alpha 1)
    delta = np.asarray(lokr_delta(adapter["weights"], "self_attn.q_proj",
                                  adapter["meta"]["alpha"]))[0]
    np.testing.assert_allclose(delta, np.kron(w1, w2a @ w2b).T * (1.0 / 3),
                               rtol=1e-5, atol=1e-5)

    # junk safetensors: loud error, not an empty adapter
    save_file({"something.unrelated": w1}, str(tmp_path / "junk.safetensors"))
    with pytest.raises(ValueError, match="no recognizable adapter keys"):
        load_adapter_file(str(tmp_path / "junk.safetensors"))


def test_load_adapter_from_directory(tmp_path):
    """A PEFT dump DIRECTORY resolves to the adapter file inside it
    (reference lora/lifecycle._resolve_lokr_weights directory form)."""
    from safetensors.numpy import save_file

    from acestep_tpu.lora.manager import load_adapter_file

    rng = np.random.default_rng(0)
    tensors = {
        "base.layers.0.self_attn.q_proj.lora_A.weight":
            rng.standard_normal((4, 16)).astype(np.float32),
        "base.layers.0.self_attn.q_proj.lora_B.weight":
            rng.standard_normal((16, 4)).astype(np.float32),
    }
    d = tmp_path / "adapter_dir"
    d.mkdir()
    save_file(tensors, str(d / "adapter_model.safetensors"))
    adapter = load_adapter_file(str(d))
    assert adapter["weights"]["self_attn.q_proj"]["down"].shape == (1, 16, 4)
    # ambiguous directories fail loudly
    save_file(tensors, str(d / "other.safetensors"))
    save_file(tensors, str(d / "more.safetensors"))
    (d / "adapter_model.safetensors").unlink()
    with pytest.raises(ValueError, match="cannot resolve"):
        load_adapter_file(str(d))


def test_dora_magnitude_reshapes_merged_weight(tiny):
    """DoRA (PEFT use_dora / LyCORIS dora_wd, reference lora/
    lifecycle.py:131-147): the adapter's magnitude vector replaces the
    merged weight's per-output-column norm."""
    from acestep_tpu.lora.adapters import merge_weights, target_paths

    cfg, params = tiny
    adapter = init_lora(jax.random.PRNGKey(1), params, rank=2)
    name = "self_attn.q_proj"
    w = target_paths(params)[name]
    L, d_in, d_out = w.shape
    aw = dict(adapter["weights"][name])
    aw["up"] = jnp.ones_like(aw["up"]) * 0.05     # nonzero delta
    aw["dora_m"] = jnp.full((L, d_out), 0.7, jnp.float32)
    weights = {name: aw}
    merged = merge_weights(params, weights, 1.0, adapter["meta"])
    w2 = target_paths(merged)[name]
    norms = np.linalg.norm(np.asarray(w2, np.float64), axis=1)
    np.testing.assert_allclose(norms, 0.7, rtol=1e-4)
    # without the magnitude, norms differ (decomposition actually applied)
    plain = merge_weights(params, {name: {k: v for k, v in aw.items()
                                          if k != "dora_m"}},
                          1.0, adapter["meta"])
    norms_plain = np.linalg.norm(
        np.asarray(target_paths(plain)[name], np.float64), axis=1)
    assert not np.allclose(norms_plain, 0.7, rtol=1e-3)


def test_peft_dora_import_attaches_magnitude(tmp_path):
    """A PEFT use_dora=True checkpoint's lora_magnitude_vector keys import
    as the per-target dora_m stack."""
    from safetensors.numpy import save_file

    from acestep_tpu.lora.manager import load_adapter_file

    rng = np.random.default_rng(0)
    tensors = {}
    for layer in range(2):
        base = f"base.layers.{layer}.self_attn.q_proj"
        tensors[f"{base}.lora_A.weight"] = \
            rng.standard_normal((4, 16)).astype(np.float32)
        tensors[f"{base}.lora_B.weight"] = \
            rng.standard_normal((16, 4)).astype(np.float32)
        tensors[f"{base}.lora_magnitude_vector.weight"] = \
            rng.standard_normal((16,)).astype(np.float32)
    path = str(tmp_path / "adapter_model.safetensors")
    save_file(tensors, path)
    adapter = load_adapter_file(path)
    assert adapter["weights"]["self_attn.q_proj"]["dora_m"].shape == (2, 16)


def test_peft_sidecar_alpha_respected(tmp_path):
    """adapter_config.json lora_alpha must scale foreign PEFT adapters."""
    import json

    from safetensors.numpy import save_file

    from acestep_tpu.lora.manager import load_adapter_file

    rng = np.random.default_rng(0)
    tensors = {}
    for layer in range(2):
        tensors[f"base.layers.{layer}.self_attn.q_proj.lora_A.weight"] = \
            rng.standard_normal((4, 16)).astype(np.float32)   # (r, in)
        tensors[f"base.layers.{layer}.self_attn.q_proj.lora_B.weight"] = \
            rng.standard_normal((16, 4)).astype(np.float32)   # (out, r)
    path = str(tmp_path / "adapter_model.safetensors")
    save_file(tensors, path)
    (tmp_path / "adapter_config.json").write_text(
        json.dumps({"r": 4, "lora_alpha": 32}))

    adapter = load_adapter_file(path)
    assert adapter["meta"]["rank"] == 4
    assert adapter["meta"]["alpha"] == 32
    assert adapter["weights"]["self_attn.q_proj"]["down"].shape == (2, 16, 4)
    assert adapter["weights"]["self_attn.q_proj"]["up"].shape == (2, 4, 16)

def test_partial_dora_and_mixed_format_fail_loudly(tmp_path):
    """A file with lora_magnitude_vector on only some layers, or one that
    mixes PEFT LoRA and LyCORIS LoKr keys, must error rather than silently
    dropping half the adapter."""
    from safetensors.numpy import save_file

    from acestep_tpu.lora.manager import load_adapter_file

    rng = np.random.default_rng(0)

    def lora_pair(layer):
        base = f"base.layers.{layer}.self_attn.q_proj"
        return {
            f"{base}.lora_A.weight":
                rng.standard_normal((4, 16)).astype(np.float32),
            f"{base}.lora_B.weight":
                rng.standard_normal((16, 4)).astype(np.float32),
        }

    partial = {**lora_pair(0), **lora_pair(1),
               "base.layers.0.self_attn.q_proj.lora_magnitude_vector.weight":
                   rng.standard_normal((16,)).astype(np.float32)}
    p = str(tmp_path / "partial_dora.safetensors")
    save_file(partial, p)
    with pytest.raises(ValueError, match="only 1/2 layers"):
        load_adapter_file(p)

    mixed = {**lora_pair(0),
             "lycoris_base_layers_0_mlp_gate_proj.lokr_w1":
                 rng.standard_normal((2, 4)).astype(np.float32),
             "lycoris_base_layers_0_mlp_gate_proj.lokr_w2":
                 rng.standard_normal((8, 6)).astype(np.float32)}
    m = str(tmp_path / "mixed.safetensors")
    save_file(mixed, m)
    with pytest.raises(ValueError, match="mixes PEFT"):
        load_adapter_file(m)

def test_lokr_scale_and_dora_semantics(tmp_path):
    """LyCORIS lokr scale rules (lycoris/modules/lokr.py): both factors
    full -> alpha ignored (scale 1); rank-factored -> alpha/rank. Per-
    module alphas stay per-module (baked into the factors), and
    dora_scale tensors import as the dora_m magnitude stack."""
    from safetensors.numpy import save_file

    from acestep_tpu.lora.adapters import lokr_delta
    from acestep_tpu.lora.manager import load_adapter_file

    rng = np.random.default_rng(1)
    w1_full = rng.standard_normal((2, 4)).astype(np.float32)
    w2_full = rng.standard_normal((8, 6)).astype(np.float32)
    w1b = rng.standard_normal((2, 4)).astype(np.float32)
    w2a = rng.standard_normal((8, 2)).astype(np.float32)   # rank 2
    w2b = rng.standard_normal((2, 6)).astype(np.float32)
    dora = np.abs(rng.standard_normal((16, 1))).astype(np.float32)
    tensors = {
        # module A: both full + alpha stored -> alpha must be IGNORED
        "lycoris_base_layers_0_self_attn_q_proj.lokr_w1": w1_full,
        "lycoris_base_layers_0_self_attn_q_proj.lokr_w2": w2_full,
        "lycoris_base_layers_0_self_attn_q_proj.alpha":
            np.asarray(4.0, np.float32),
        "lycoris_base_layers_0_self_attn_q_proj.dora_scale": dora,
        # module B: w2 factored at rank 2 with alpha 8 -> scale 4
        "lycoris_base_layers_0_mlp_gate_proj.lokr_w1": w1b,
        "lycoris_base_layers_0_mlp_gate_proj.lokr_w2_a": w2a,
        "lycoris_base_layers_0_mlp_gate_proj.lokr_w2_b": w2b,
        "lycoris_base_layers_0_mlp_gate_proj.alpha":
            np.asarray(8.0, np.float32),
    }
    path = str(tmp_path / "lokr_mixed.safetensors")
    save_file(tensors, path)
    adapter = load_adapter_file(path)
    assert adapter["meta"]["alpha"] == 1.0
    d_q = np.asarray(lokr_delta(adapter["weights"], "self_attn.q_proj", 1.0))[0]
    np.testing.assert_allclose(d_q, np.kron(w1_full, w2_full).T,
                               rtol=1e-5, atol=1e-5)
    d_g = np.asarray(lokr_delta(adapter["weights"], "mlp.gate", 1.0))[0]
    np.testing.assert_allclose(d_g, np.kron(w1b, w2a @ w2b).T * 4.0,
                               rtol=1e-4, atol=1e-4)
    # dora_scale -> per-target magnitude stack
    assert adapter["weights"]["self_attn.q_proj"]["dora_m"].shape == (1, 16)
    assert "dora_m" not in adapter["weights"]["mlp.gate"]
