"""Repetition penalty + per-phase temperature tests (VERDICT r2 items 2-3).

Reference semantics:
- repetition penalty: nanovllm/sampling_params.py:13 +
  engine/model_runner.py:528-552 — completion tokens only, applied to the
  CONDITIONAL logits before the CFG mix, transformers formula
  (score<0 -> score*p, else score/p).
- per-phase temperatures: constrained_logits_processor.py:149-152,1666-1695 —
  metadata_temperature scales CoT-phase logits, codes_temperature scales
  codes-phase logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acestep_tpu.llm.handler import LLMHandler
from acestep_tpu.models.lm import apply_repetition_penalty


@pytest.fixture(scope="module")
def handler():
    h = LLMHandler(dtype=jnp.float32)
    h.initialize(num_fallback_codes=32, max_duration=600, seed=0)
    return h


# ------------------------------------------------------------------
# formula
# ------------------------------------------------------------------


def test_repetition_penalty_formula():
    logits = jnp.asarray([[2.0, -2.0, 4.0, -4.0]])
    seen = jnp.asarray([[True, True, False, False]])
    out = np.asarray(apply_repetition_penalty(logits, seen, 2.0))
    # seen positive -> /p ; seen negative -> *p ; unseen untouched
    assert out[0].tolist() == [1.0, -4.0, 4.0, -4.0]


def test_repetition_penalty_identity():
    logits = jnp.asarray([[1.0, -1.0]])
    seen = jnp.asarray([[True, True]])
    out = np.asarray(apply_repetition_penalty(logits, seen, 1.0))
    assert out[0].tolist() == [1.0, -1.0]


# ------------------------------------------------------------------
# engine behavior
# ------------------------------------------------------------------


def test_unconstrained_decode_penalty_bans_repeats(handler):
    """Greedy decode with a huge penalty can never emit a token twice."""
    eng = handler.engine
    prompt = "# Caption\ntest\n"
    out_pen = eng.generate([prompt], temperature=0.0, max_new_tokens=16,
                           repetition_penalty=1e6, seed=0)
    toks = out_pen.token_ids[0]
    assert len(toks) > 1
    assert len(set(toks)) == len(toks), "huge penalty must forbid reuse"


def test_unconstrained_decode_penalty_diverges(handler):
    """Penalized greedy decode differs from unpenalized (fail-pre-fix: the
    field used to be silently ignored, making these identical)."""
    eng = handler.engine
    prompt = "# Caption\ntest\n"
    base = eng.generate([prompt], temperature=0.0, max_new_tokens=16, seed=0)
    pen = eng.generate([prompt], temperature=0.0, max_new_tokens=16,
                       repetition_penalty=1e6, seed=0)
    # greedy decode of a tiny random LM loops; the penalty must break the loop
    assert base.token_ids[0] != pen.token_ids[0]


def test_codes_decode_penalty_bans_repeats(handler):
    """The on-device codes scan honors the penalty: greedy + huge penalty
    yields all-distinct codes; the unpenalized greedy scan repeats."""
    eng = handler.engine
    prompt = "# Caption\ntest\n"
    pen = eng.generate_codes([prompt], temperature=0.0, n_codes=12,
                             repetition_penalty=1e6, seed=0)[0]
    assert len(set(pen)) == len(pen)
    base = eng.generate_codes([prompt], temperature=0.0, n_codes=12, seed=0)[0]
    assert base != pen


def test_cot_device_penalty_accepted(handler):
    """The device CoT while_loop accepts the penalty and still produces a
    schema-valid plan (the FSM mask bounds how much the penalty can bend)."""
    out = handler.generate_with_stop_condition(
        "warm synthwave", infer_type="dit", repetition_penalty=1.3,
        seed=3, cfg_scale=1.0)
    assert "bpm" in out["metadata"]


# ------------------------------------------------------------------
# per-phase temperatures
# ------------------------------------------------------------------


def test_phase_temperatures_reach_engine(handler, monkeypatch):
    """metadata_temperature drives phase 1, codes_temperature phase 2."""
    calls = {}

    orig_cot = handler.engine.generate_cot_device
    orig_codes = handler.engine.generate_codes

    def spy_cot(*a, **kw):
        calls["cot_temp"] = kw.get("temperature")
        return orig_cot(*a, **kw)

    def spy_codes(*a, **kw):
        calls["codes_temp"] = kw.get("temperature")
        return orig_codes(*a, **kw)

    monkeypatch.setattr(handler.engine, "generate_cot_device", spy_cot)
    monkeypatch.setattr(handler.engine, "generate_codes", spy_codes)
    handler.generate_with_stop_condition(
        "test", temperature=0.85, metadata_temperature=0.3,
        codes_temperature=1.2, target_duration=2, seed=0, cfg_scale=1.0)
    assert calls["cot_temp"] == 0.3
    assert calls["codes_temp"] == 1.2


def test_phase_temperatures_default_to_base(handler, monkeypatch):
    calls = {}
    orig_cot = handler.engine.generate_cot_device

    def spy(*a, **kw):
        calls["t"] = kw.get("temperature")
        return orig_cot(*a, **kw)

    monkeypatch.setattr(handler.engine, "generate_cot_device", spy)
    handler.generate_with_stop_condition(
        "test", infer_type="dit", temperature=0.7, seed=0, cfg_scale=1.0)
    assert calls["t"] == 0.7


# ------------------------------------------------------------------
# REST schema threading
# ------------------------------------------------------------------


def test_request_to_params_threads_lm_knobs():
    from acestep_tpu.serving.schemas import GenerateMusicRequest
    from acestep_tpu.serving.server import request_to_params

    req = GenerateMusicRequest.from_dict({
        "prompt": "x", "lm_metadata_temperature": 0.2,
        "lm_codes_temperature": 1.1, "lm_repetition_penalty": 1.15,
    })
    params = request_to_params(req)
    assert params.lm_metadata_temperature == 0.2
    assert params.lm_codes_temperature == 1.1
    assert params.lm_repetition_penalty == 1.15
    # unset stays None (phase temp falls back to lm_temperature downstream)
    p2 = request_to_params(GenerateMusicRequest.from_dict({"prompt": "x"}))
    assert p2.lm_metadata_temperature is None
    assert p2.lm_codes_temperature is None
    assert p2.lm_repetition_penalty == 1.0


def test_understand_knob_surface(handler):
    """Facade understand_music accepts the reference's knob set and returns
    metadata (+ free-form lyrics when the model emits them)."""
    from acestep_tpu.inference import understand_music

    codes = "".join(f"<|audio_code_{i}|>" for i in range(10))
    res = understand_music(handler, codes, temperature=0.9, top_k=5,
                           top_p=0.95, repetition_penalty=1.1,
                           use_constrained_decoding=True)
    assert res.error is None or res.success


# ------------------------------------------------------------------
# review regressions (round-3 code-review findings)
# ------------------------------------------------------------------


def test_vocab_use_covers_sparse_token_ids():
    """vocab_use must bound the MAX ASSIGNED id, not len(tokenizer): HF
    vocabs can place added <|audio_code_N|> ids above a padded boundary,
    leaving holes (review finding: the codes-scan slice crashed there)."""
    from acestep_tpu.config import LMConfig
    from acestep_tpu.llm.generator import LMEngine
    from acestep_tpu.llm.tokenizer import SimpleTokenizer
    from acestep_tpu.models.lm import init_lm_params

    class SparseTok(SimpleTokenizer):
        """Audio-code ids relocated above a gap (base ids + 64 offset)."""

        def __init__(self):
            super().__init__(num_audio_codes=8)
            self._gap = 64

        def get_vocab(self):
            base = {t: i for i, t in enumerate(self._id_to_text)}
            out = {}
            for t, i in base.items():
                out[t] = i + self._gap if "audio_code" in t else i
            return out

        def audio_code_id(self, n):
            return super().audio_code_id(n) + self._gap

        def encode(self, text):
            return [i + self._gap
                    if self._id_to_text[i].startswith("<|audio_code_")
                    else i for i in super().encode(text)]

        def decode(self, ids):
            return super().decode(
                [i - self._gap if i - self._gap >= 0
                 and self._id_to_text[i - self._gap].startswith("<|audio_code_")
                 else i for i in ids])

    tok = SparseTok()
    cfg = LMConfig.tiny(vocab_size=512)
    params = jax.jit(lambda k: init_lm_params(k, cfg))(jax.random.PRNGKey(0))
    eng = LMEngine(params, cfg, tok, dtype=jnp.float32)
    start, end = eng._audio_code_range()
    assert eng.vocab_use >= end, (eng.vocab_use, end)
    codes = eng.generate_codes(["hello"], n_codes=4, seed=0)[0]
    assert all(0 <= c < 8 for c in codes)


def test_prefix_with_empty_prompt_row_is_safe(handler):
    """An empty prompt with a prefix must not produce a negative start
    position (review finding: P could go to -1)."""
    eng = handler.engine
    tables = handler._cot_tables(None, None, None)
    _, state = eng.generate_cot_device(
        handler.build_formatted_prompt("a", ""), fsm_tables=tables,
        max_tokens=16, seed=0, return_state=True)
    out = eng.generate([""], max_new_tokens=4, seed=0, prefix=state)
    assert len(out.token_ids[0]) > 0
    assert eng.last_prefill_stats["reused_tokens"] == 0


def test_understand_constrained_is_device_looped(handler, monkeypatch):
    """Constrained understand must use the device CoT loop + prefix-reused
    lyrics continuation, not a per-token host-FSM loop (review finding:
    up to 1024 host round-trips per call)."""
    calls = {"cot": 0, "gen_fsms": []}
    orig_cot = handler.engine.generate_cot_device
    orig_gen = handler.engine.generate

    def spy_cot(*a, **kw):
        calls["cot"] += 1
        return orig_cot(*a, **kw)

    def spy_gen(*a, **kw):
        calls["gen_fsms"].append(kw.get("fsms"))
        calls["seen"] = kw.get("seen_tokens")
        return orig_gen(*a, **kw)

    monkeypatch.setattr(handler.engine, "generate_cot_device", spy_cot)
    monkeypatch.setattr(handler.engine, "generate", spy_gen)
    meta = handler.understand("<|audio_code_1|><|audio_code_2|>", seed=0)
    assert calls["cot"] == 1
    assert all(f is None for f in calls["gen_fsms"])  # lyrics: unconstrained
    # repetition-penalty continuity: the CoT tokens seed the lyrics phase's
    # completion set (one-generation semantics, as in the reference)
    assert calls["seen"] and len(calls["seen"][0]) > 0
    assert isinstance(meta, dict)
    # the lyrics continuation reused the CoT phase's KV prefix
    assert handler.engine.last_prefill_stats["reused_tokens"] > 0


# ------------------------------------------------------------------
# quantized LM decode
# ------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["int8", "fp8", "w8a8"])
def test_quantized_lm_two_phase(mode):
    """LLMHandler(quantization=...) runs the full two-phase protocol; the
    trunk weights are stored quantized (w8a8 keeps them int8 inside the
    decode loops — halved per-step weight reads at real geometry)."""
    from acestep_tpu.ops.quant import QUANT_KEY, FP8_KEY, W8A8_KEY

    h = LLMHandler(dtype=jnp.float32)
    h.initialize(num_fallback_codes=32, max_duration=600, seed=0,
                 quantization=mode)
    node = h.engine.params["layers"]["self_attn"]["q_proj"]["w"]
    key = {"int8": QUANT_KEY, "fp8": FP8_KEY, "w8a8": W8A8_KEY}[mode]
    assert isinstance(node, dict) and key in node
    # embeddings stay full precision
    assert not isinstance(h.engine.params["embed_tokens"], dict)
    out = h.generate_with_stop_condition(
        "quant bench", target_duration=2, seed=0, cfg_scale=2.0)
    assert out["audio_codes"].count("<|audio_code_") == 10


@pytest.mark.slow
def test_quantized_lm_close_to_fp(monkeypatch):
    """int8 weight-only logits stay close to full precision on a tiny LM."""
    import numpy as np

    from acestep_tpu.config import LMConfig
    from acestep_tpu.llm.generator import LMEngine
    from acestep_tpu.llm.tokenizer import SimpleTokenizer
    from acestep_tpu.models.lm import init_lm_params
    from acestep_tpu.ops.quant import quantize_tree

    tok = SimpleTokenizer(num_audio_codes=16)
    cfg = LMConfig.tiny(vocab_size=256)
    params = jax.jit(lambda k: init_lm_params(k, cfg))(jax.random.PRNGKey(0))
    a = LMEngine(params, cfg, tok, dtype=jnp.float32)
    qparams = quantize_tree(params, "int8", exclude_prefixes=("lm_head",))
    b = LMEngine(qparams, cfg, tok, dtype=jnp.float32)
    la, _, _, _ = a._prefill_prompts(["hello world"], 8)
    lb, _, _, _ = b._prefill_prompts(["hello world"], 8)
    la, lb = np.asarray(la), np.asarray(lb)
    denom = max(1e-6, float(np.abs(la).max()))
    assert float(np.abs(la - lb).max()) / denom < 0.15


@pytest.mark.slow
@pytest.mark.parametrize("tied", [True, False])
def test_head_q_logits_close_to_dense(tied):
    """The int8 output head (build_head_q) matches the dense sliced head
    within quantization tolerance, for BOTH tied and untied layouts."""
    import numpy as np

    from acestep_tpu.config import LMConfig
    from acestep_tpu.models.lm import (
        build_head_q, init_lm_params, lm_logits, lm_logits_slice,
    )

    cfg = LMConfig.tiny(vocab_size=384, tie_word_embeddings=tied)
    params = jax.jit(lambda k: init_lm_params(k, cfg))(jax.random.PRNGKey(0))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (2, 3, cfg.hidden_size))

    dense = np.asarray(lm_logits_slice(params, cfg, hidden, 64, 320))
    qparams = dict(params)
    qparams["head_q"] = build_head_q(params, cfg)
    if not tied:
        qparams.pop("lm_head")          # untied w8a8 drops the bf16 head
    quant = np.asarray(lm_logits_slice(qparams, cfg, hidden, 64, 320))
    rel = np.abs(dense - quant).max() / max(np.abs(dense).max(), 1e-6)
    assert rel < 0.03, rel
    # full-vocab fallback also works without lm_head
    full = np.asarray(lm_logits(qparams, cfg, hidden))
    ref = np.asarray(lm_logits(params, cfg, hidden))
    relf = np.abs(full - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert relf < 0.03, relf
