"""Facade tests: generate_music(params, config) contract incl. LM-phase stub."""

import numpy as np
import pytest

import jax.numpy as jnp

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.inference import (
    GenerationConfig, GenerationParams, generate_music, understand_music,
)
from acestep_tpu.pipeline.handler import AceStepHandler


@pytest.fixture(scope="module")
def handler():
    h = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        dtype=jnp.float32, frame_bucket=20, min_frames=20, refer_frames=10,
    )
    h.initialize_service(seed=0)
    return h


class FakeLLM:
    """Stub planner following the LLMHandler protocol used by the facade."""

    def plan(self, **kw):
        self.last_kwargs = kw
        return {
            "metadata": {"bpm": 128, "duration": 0.8, "caption": "LM caption",
                         "keyscale": "C major", "language": "en",
                         "timesignature": 4},
            "audio_codes": "<|audio_code_1|><|audio_code_2|>",
        }

    def understand(self, codes, **kw):
        return {"caption": "understood", "bpm": 90}


def test_generate_music_no_lm(handler, tmp_path):
    params = GenerationParams(caption="hello world", lyrics="la la",
                              duration=0.8, seed=11, thinking=False)
    config = GenerationConfig(batch_size=1, use_random_seed=False,
                              output_dir=str(tmp_path), audio_format="wav")
    res = generate_music(handler, None, params, config)
    assert res.success, res.error
    assert len(res.audios) == 1
    assert res.audios[0]["path"].endswith(".wav")
    assert res.audios[0]["seed"] == 11
    assert "time_costs" in res.extra_outputs


def test_generate_music_with_lm_metadata_merge(handler, tmp_path):
    llm = FakeLLM()
    params = GenerationParams(caption="", lyrics="la", duration=-1.0,
                              bpm=None, thinking=True, seed=3)
    config = GenerationConfig(batch_size=1, use_random_seed=False,
                              output_dir=str(tmp_path))
    config.audio_format = "wav"
    res = generate_music(handler, llm, params, config)
    assert res.success, res.error
    # LM duration (0.8 s) should drive frames; LM codes switch task to cover
    assert res.extra_outputs["task"] == "cover"
    assert res.extra_outputs["lm_metadata"]["bpm"] == 128
    assert res.extra_outputs["audio_codes"].startswith("<|audio_code_")


def test_user_metadata_wins_over_lm(handler, tmp_path):
    llm = FakeLLM()
    params = GenerationParams(caption="user caption", lyrics="la",
                              duration=0.8, bpm=99, use_cot_caption=False,
                              thinking=True, seed=5)
    config = GenerationConfig(batch_size=1, use_random_seed=False,
                              output_dir=str(tmp_path), audio_format="wav")
    res = generate_music(handler, llm, params, config)
    assert res.success, res.error
    assert res.audios[0]["params"]["bpm"] == 99


def test_cot_knobs_plan_metadata_with_thinking_off(handler, tmp_path):
    """Reference inference.py:397-398,447: use_cot_* request LM planning
    even with thinking=False, but in metadata-only mode (infer_type='dit',
    no codes generation)."""
    llm = FakeLLM()
    params = GenerationParams(caption="", lyrics="la", duration=0.8,
                              thinking=False, seed=3)   # use_cot_* default on
    config = GenerationConfig(batch_size=1, use_random_seed=False,
                              output_dir=str(tmp_path))
    res = generate_music(handler, llm, params, config)
    assert res.success, res.error
    assert llm.last_kwargs["infer_type"] == "dit"       # no codes phase
    assert res.extra_outputs["lm_metadata"]["caption"] == "LM caption"

    # all CoT knobs off + thinking off: the LM is never called
    llm2 = FakeLLM()
    params2 = GenerationParams(caption="x", lyrics="la", duration=0.8,
                               thinking=False, seed=3,
                               use_cot_caption=False, use_cot_language=False,
                               use_cot_metas=False)
    res2 = generate_music(handler, llm2, params2, config)
    assert res2.success
    assert not hasattr(llm2, "last_kwargs")

    # thinking on (plain text2music, no user codes): codes phase requested
    llm3 = FakeLLM()
    params3 = GenerationParams(caption="x", lyrics="la", duration=0.8,
                               thinking=True, seed=3)
    res3 = generate_music(handler, llm3, params3, config)
    assert res3.success
    assert llm3.last_kwargs["infer_type"] == "llm_dit"


def test_analyze_input_honors_knobs():
    """analysis_only planning shares the generation path's knob mapping:
    pinned metadata reaches the planner and a missing LM fails cleanly."""
    from acestep_tpu.inference import analyze_input

    llm = FakeLLM()
    params = GenerationParams(caption="a waltz", bpm=123, keyscale="A minor",
                              seed=7, use_constrained_decoding=False)
    out = analyze_input(llm, params)
    assert out["success"]
    kw = llm.last_kwargs
    assert kw["infer_type"] == "dit"
    assert kw["user_metadata"]["bpm"] == 123
    assert kw["user_metadata"]["keyscale"] == "A minor"
    assert kw["constrained"] is False
    assert kw["seed"] == 7

    out2 = analyze_input(None, params)
    assert not out2["success"] and "not initialized" in out2["error"]


def test_generate_music_error_payload(handler):
    params = GenerationParams(caption="x", duration=0.8,
                              infer_method="nonsense_method", thinking=False)
    # invalid audio format triggers the failure path deterministically
    config = GenerationConfig(batch_size=1, audio_format="not_a_format")
    res = generate_music(handler, None, params, config)
    assert not res.success
    assert res.error


def test_understand_music_stub():
    res = understand_music(FakeLLM(), "<|audio_code_1|>")
    assert res.success
    assert res.caption == "understood"
    res2 = understand_music(None, "")
    assert not res2.success


@pytest.mark.slow
def test_want_lrc_attaches_lrc_and_score():
    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig, VAEConfig
    from acestep_tpu.inference import (
        GenerationConfig, GenerationParams, generate_music)
    from acestep_tpu.pipeline.handler import AceStepHandler

    h = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        dtype=jnp.float32, frame_bucket=16, min_frames=16, refer_frames=10)
    h.initialize_service(seed=0)
    params = GenerationParams(caption="a song", lyrics="la la\nla la",
                              duration=0.64, thinking=False, seed=1)
    config = GenerationConfig(batch_size=1, want_lrc=True,
                              output_dir=None)
    res = generate_music(h, None, params, config)
    assert res.success, res.error
    assert "lrc" in res.audios[0], res.audios[0].get("lrc_error")
    assert isinstance(res.audios[0]["lrc"], str)
    assert 0.0 <= res.audios[0]["alignment_score"]["score"] <= 1.0

    # instrumental: no LRC attempted
    params.lyrics = "[inst]"
    res2 = generate_music(h, None, params, config)
    assert "lrc" not in res2.audios[0]


@pytest.mark.slow
def test_batch_thinking_per_item_plans():
    """allow_lm_batch: each song in a batch gets its own LM codes."""
    import jax.numpy as jnp

    from acestep_tpu.config import DiTConfig, VAEConfig
    from acestep_tpu.inference import (
        GenerationConfig, GenerationParams, generate_music)
    from acestep_tpu.llm.handler import LLMHandler
    from acestep_tpu.pipeline.handler import AceStepHandler

    h = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        dtype=jnp.float32, frame_bucket=16, min_frames=16, refer_frames=10)
    h.initialize_service(seed=0)
    llm = LLMHandler()
    llm.initialize()
    params = GenerationParams(caption="edm", lyrics="[inst]", duration=2,
                              thinking=True, seed=1, lm_temperature=0.9)
    config = GenerationConfig(batch_size=2, allow_lm_batch=True,
                              output_dir=None, seeds=[1, 2])
    res = generate_music(h, llm, params, config)
    assert res.success, res.error
    codes = res.extra_outputs["audio_codes"]
    assert isinstance(codes, list) and len(codes) == 2
    assert codes[0] != codes[1]          # per-item plans differ
    assert res.extra_outputs["task"] == "cover"   # codes => cover switch
