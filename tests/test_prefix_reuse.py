"""Phase-1 -> phase-2 KV prefix reuse (VERDICT r2 item 5).

Reference behavior: nano-vllm prefix caching (engine/block_manager.py,
`num_cached_tokens`) lets the phase-2 prompt — which extends phase 1's —
skip re-prefilling the shared prefix. Here the phase-1 device loops return
a PrefixState (KV cache + per-row token streams); the phase-2 prefill
grafts the common-prefix K/V and forwards only the delta tokens.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from acestep_tpu.llm.handler import LLMHandler


@pytest.fixture(scope="module")
def handler():
    h = LLMHandler(dtype=jnp.float32)
    h.initialize(num_fallback_codes=32, max_duration=600, seed=0)
    return h


def test_codes_prefill_reuses_phase1_prefix(handler):
    """generate_codes with the phase-1 state processes only delta tokens."""
    eng = handler.engine
    tables = handler._cot_tables(None, None, None)
    p1 = handler.build_formatted_prompt("warm synth ballad", "la la la")
    out, state = eng.generate_cot_device(
        p1, fsm_tables=tables, max_tokens=64, seed=0, return_state=True)
    assert len(out) > 0 and state.cache is not None

    cot_text = handler.tokenizer.decode(out)
    p2 = handler.build_formatted_prompt_with_cot(
        "warm synth ballad", "la la la", cot_text)

    eng.generate_codes([p2], n_codes=6, seed=1, prefix=state)
    stats = eng.last_prefill_stats
    assert stats["reused_tokens"] > 0
    assert stats["delta_tokens"] < stats["prompt_tokens"]
    # the shared chat-template prefix (system + user turns) must be served
    # from cache — it is the bulk of the phase-2 prompt
    assert stats["reused_tokens"] >= stats["prompt_tokens"] // 2


def test_codes_equal_with_and_without_reuse(handler):
    """Prefix-reuse is a pure optimization: same codes either way."""
    eng = handler.engine
    tables = handler._cot_tables(None, None, None)
    p1 = handler.build_formatted_prompt("midnight jazz", "")
    out, state = eng.generate_cot_device(
        p1, fsm_tables=tables, max_tokens=64, seed=2, return_state=True)
    cot_text = handler.tokenizer.decode(out)
    p2 = handler.build_formatted_prompt_with_cot("midnight jazz", "", cot_text)

    fresh = eng.generate_codes([p2], n_codes=8, seed=7, temperature=0.0)
    reused = eng.generate_codes([p2], n_codes=8, seed=7, temperature=0.0,
                                prefix=state)
    assert fresh == reused


def test_cfg_paired_reuse_through_handler(handler):
    """The full two-phase protocol (CFG-paired rows) reuses the prefix and
    still produces a valid plan."""
    res = handler.generate_with_stop_condition(
        "lofi beats", target_duration=2, seed=0, cfg_scale=2.0)
    assert res["audio_codes"].count("<|audio_code_") == 10
    stats = handler.engine.last_prefill_stats
    assert stats["rows"] == 2          # cond + uncond
    assert stats["reused_tokens"] > 0


def test_batch_plan_reuse(handler):
    """plan_batch threads the batched phase-1 state into the codes scan."""
    plans = handler.plan_batch("synthwave", n=2, target_duration=2, seed=1,
                               cfg_scale=2.0)
    assert len(plans) == 2
    for p in plans:
        assert p["audio_codes"].count("<|audio_code_") == 10
    stats = handler.engine.last_prefill_stats
    assert stats["rows"] == 4          # 2 cond + 2 uncond
    assert stats["reused_tokens"] > 0


def test_cross_request_prefix_reuse(handler):
    """Back-to-back requests share the chat-template/system prefix: the
    engine retains the last CoT phase's KV state (the role of nano-vllm
    BlockManager prefix caching, engine/block_manager.py
    `num_cached_tokens`) and the NEXT request's phase-1 prefill serves
    the common prefix from it."""
    eng = handler.engine
    eng._cross_prefix = None               # isolate from earlier tests
    handler.generate_with_stop_condition(
        "crisp electro house", target_duration=2, seed=3, cfg_scale=2.0)
    assert eng._cross_prefix is not None
    before = dict(eng.prefill_stats)
    handler.generate_with_stop_condition(
        "crisp electro swing", target_duration=2, seed=4, cfg_scale=2.0)
    # the SECOND request's phase-1 prefill reused the shared prefix
    reused = eng.prefill_stats["reused_tokens"] - before["reused_tokens"]
    prompt = eng.prefill_stats["prompt_tokens"] - before["prompt_tokens"]
    assert reused > 0
    assert reused < prompt                 # the delta was still processed


def test_cross_request_reuse_is_pure_optimization(handler):
    """Same seed, greedy: a request served from the cross-request prefix
    cache produces the same plan as one with the cache disabled (K/V are a
    pure function of the token stream, so reuse cannot change outputs)."""
    eng = handler.engine
    kw = dict(target_duration=2, seed=9, cfg_scale=2.0,
              metadata_temperature=0.0, codes_temperature=0.0)
    eng._cross_prefix = None
    eng.cross_prefix_enabled = False
    try:
        cold = handler.generate_with_stop_condition("ambient drone", **kw)
    finally:
        eng.cross_prefix_enabled = True
    # prime the cache with a DIFFERENT caption, then repeat the request
    handler.generate_with_stop_condition("gritty trap anthem", **kw)
    assert eng._cross_prefix is not None
    warm = handler.generate_with_stop_condition("ambient drone", **kw)
    assert warm["audio_codes"] == cold["audio_codes"]
    assert warm["metadata"] == cold["metadata"]


def test_prefill_stats_accumulate(handler):
    eng = handler.engine
    before = dict(eng.prefill_stats)
    handler.generate_with_stop_condition("stats probe", target_duration=2,
                                         seed=11, cfg_scale=2.0)
    after = eng.prefill_stats
    assert after["calls"] > before["calls"]
    assert after["prompt_tokens"] > before["prompt_tokens"]


def test_mismatched_rows_fall_back_to_full_prefill(handler):
    """A prefix whose row count differs is ignored, not an error."""
    eng = handler.engine
    tables = handler._cot_tables(None, None, None)
    p1 = handler.build_formatted_prompt("a", "")
    _, state = eng.generate_cot_device(
        p1, fsm_tables=tables, max_tokens=32, seed=0, return_state=True)
    codes = eng.generate_codes(["x", "y"],
                               unconditional_prompts=["u", "v"],
                               cfg_scale=2.0, n_codes=4, seed=0, prefix=state)
    assert len(codes) == 2
    assert eng.last_prefill_stats["reused_tokens"] == 0
