"""On-device codes decoding fast path tests."""

import numpy as np
import pytest

from acestep_tpu.llm.handler import LLMHandler


@pytest.fixture(scope="module")
def handler():
    h = LLMHandler()
    h.initialize()   # tiny random LM + SimpleTokenizer
    return h


def test_generate_codes_shape_and_range(handler):
    engine = handler.engine
    codes = engine.generate_codes(
        ["make music"], unconditional_prompts=["NO USER INPUT"],
        cfg_scale=2.0, n_codes=12, seed=0)
    assert len(codes) == 1 and len(codes[0]) == 12
    n = handler.tokenizer.num_audio_codes
    assert all(0 <= c < n for c in codes[0])


def test_generate_codes_deterministic_per_seed(handler):
    engine = handler.engine
    a = engine.generate_codes(["x"], n_codes=8, seed=3, temperature=0.8)
    b = engine.generate_codes(["x"], n_codes=8, seed=3, temperature=0.8)
    c = engine.generate_codes(["x"], n_codes=8, seed=4, temperature=0.8)
    assert a == b
    assert a != c   # astronomically unlikely to collide


def test_phase2_uses_fastpath_and_counts(handler):
    out = handler.generate_with_stop_condition(
        "an energetic track", "[inst]", target_duration=4.0,
        constrained=True, seed=1)
    codes = out["audio_codes"]
    assert codes.count("<|audio_code_") == 20   # 4 s * 5 codes/s
    # parseable by the DiT-side bridge
    from acestep_tpu.pipeline.handler import AceStepHandler

    arr = AceStepHandler._parse_code_hint(codes)
    assert arr is not None and len(arr) == 20


def test_phase2_unconstrained_still_works(handler):
    out = handler.generate_with_stop_condition(
        "chill", "", target_duration=2.0, constrained=False, seed=2,
        max_cot_tokens=32)
    assert "metadata" in out


def test_prefill_budget_uses_real_prompt_length(handler):
    """A prompt just over a bucket boundary must not zero the generation
    budget when the bucket rounds up to max_len (regression: understand()
    on long songs raised 'no room for generation' despite real headroom)."""
    engine = handler.engine
    old_max = engine.max_len
    try:
        engine.max_len = 128
        prompt = "x" * 70          # ~70 tokens -> bucket 128 == max_len
        _logits, _cache, lens, budget = engine._prefill_prompts([prompt], 40)
        assert budget == min(40, 128 - int(lens.max()))
        assert budget > 0
    finally:
        engine.max_len = old_max


def test_codes_chunked_schedule_matches_single_scan(handler, monkeypatch):
    """The growing-ceiling chunked codes scan must emit the exact token
    stream of a single full-bucket scan: grown slots are zero-padded and
    masked, and the (logits, seen, key) carry threads across chunks, so
    sampling sees identical distributions at every step."""
    from acestep_tpu.llm import generator as G

    engine = handler.engine
    # shrink the ladder so a 40-code run crosses several ceilings
    monkeypatch.setattr(G, "KV_BUCKETS", (16, 24, 32, 48, 64, 96, 128))
    kw = dict(unconditional_prompts=["NO USER INPUT"], cfg_scale=2.0,
              temperature=0.9, top_p=0.9, n_codes=40, seed=5)
    chunked = engine.generate_codes(["make music"], **kw)
    scheds = [k[1] for k in engine._codes_fns if k[0] == "codes"
              and sum(s for _, s in k[1]) == 40]
    assert any(len(s) > 1 for s in scheds), "schedule never chunked"
    monkeypatch.setattr(G, "_codes_schedule",
                        lambda ph, n, S: ((S, n),))
    single = engine.generate_codes(["make music"], **kw)
    assert chunked == single


def test_kv_cache_length_bucketed(handler):
    """Two prompts of different raw length must land in the SAME cache
    shape bucket — a raw prompt+budget cache length recompiled every
    decode program per request (the phase-2 prompt embeds the sampled
    CoT, which varies per seed)."""
    e = handler.engine
    _, c1, _, _ = e._prefill_prompts(["short"], 50)
    _, c2, _, _ = e._prefill_prompts(["a somewhat longer prompt text"], 50)
    assert c1.k.shape == c2.k.shape
    from acestep_tpu.llm.generator import KV_BUCKETS
    assert c1.k.shape[2] in KV_BUCKETS
