"""PMI reward score via the 5 Hz LM.

Capability parity with the reference's `calculate_reward_score`
(/root/reference/acestep/core/scoring/lm_score.py): pointwise mutual
information between the user condition and the generated audio codes,
estimated as log P(codes | condition) - log P(codes | null condition)
under the planner LM, normalized per code token. Positive = the condition
genuinely shaped the music.

TPU design: scoring is one teacher-forced forward per prompt (a single
jitted program per length bucket) — no autoregressive loop needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


_LOGPROB_FNS: dict = {}


def _logprob_fn(cfg, dtype):
    """Jitted teacher-forced logprob program, cached per (cfg, dtype) —
    a fresh closure per call would recompile the whole LM every score."""
    key = (id(cfg), str(dtype))
    if key not in _LOGPROB_FNS:
        from acestep_tpu.models.lm import lm_encode, lm_logits
        from acestep_tpu.ops.quant import dequantize_params

        def fn(params, ids):
            # quantized engines (int8/fp8/int4 weight-only) store {'__int8__',
            # 'scale'} dicts; materialize like every generator program does
            # (w8a8 nodes stay int8 — ops/basic.linear runs those natively)
            params = dequantize_params(params, dtype)
            mask = jnp.ones_like(ids)
            hidden = lm_encode(params, cfg, ids, mask, dtype=dtype)
            logits = lm_logits(params, cfg, hidden).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            # token at position i+1 predicted from position i
            pred = logp[0, :-1]
            tgt = ids[0, 1:]
            return jnp.take_along_axis(pred, tgt[:, None], axis=-1)[:, 0]

        _LOGPROB_FNS[key] = jax.jit(fn)
    return _LOGPROB_FNS[key]


def sequence_logprob(params: dict, cfg, input_ids: np.ndarray,
                     target_start: int, dtype=jnp.bfloat16) -> float:
    """Sum of log P(token_i | tokens_<i) for i >= target_start.

    input_ids: (L,) full prompt+target token ids."""
    ids = jnp.asarray(input_ids, jnp.int32)[None]
    token_lp = np.asarray(_logprob_fn(cfg, dtype)(params, ids))
    return float(token_lp[max(target_start - 1, 0):].sum())


def calculate_reward_score(llm_handler, audio_codes: str, caption: str = "",
                           lyrics: str = "",
                           negative_prompt: str = "NO USER INPUT",
                           ) -> dict:
    """PMI score for generated codes under the user condition.

    Returns {pmi, cond_logprob, uncond_logprob, num_codes, score} where
    score is pmi normalized per code and squashed to 0-1."""
    engine = getattr(llm_handler, "engine", None)
    if engine is None:
        raise RuntimeError("LLM handler not initialized")
    tokenizer = llm_handler.tokenizer
    cfg = llm_handler.cfg

    cond_prompt = llm_handler.build_formatted_prompt(caption, lyrics)
    uncond_prompt = llm_handler.build_formatted_prompt(negative_prompt, "")

    cond_ids = tokenizer.encode(cond_prompt)
    uncond_ids = tokenizer.encode(uncond_prompt)
    code_ids = tokenizer.encode(audio_codes)
    n_codes = max(len(code_ids), 1)

    cond_full = np.asarray(list(cond_ids) + list(code_ids), np.int32)
    uncond_full = np.asarray(list(uncond_ids) + list(code_ids), np.int32)

    cond_lp = sequence_logprob(engine.params, cfg, cond_full, len(cond_ids),
                               dtype=engine.dtype)
    uncond_lp = sequence_logprob(engine.params, cfg, uncond_full,
                                 len(uncond_ids), dtype=engine.dtype)
    pmi = cond_lp - uncond_lp
    per_code = pmi / n_codes
    score = float(1.0 / (1.0 + np.exp(-4.0 * per_code)))  # squash to (0,1)
    return {"pmi": float(pmi), "cond_logprob": cond_lp,
            "uncond_logprob": uncond_lp, "num_codes": n_codes,
            "score": score}
