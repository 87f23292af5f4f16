"""Scoring & alignment: LRC lyric timestamps, alignment quality, PMI reward.

Capability parity with /root/reference/acestep/core/scoring/:
- `dtw` (numpy anti-diagonal DTW — the reference uses numba; same algorithm)
- `MusicStampsAligner` (cross-attention -> token/sentence timestamps -> LRC)
- `lyric_alignment_score` (alignment-quality metric, dit_score.py)
- `calculate_reward_score` (PMI cond-vs-uncond LM log-prob, lm_score.py)
"""

from acestep_tpu.scoring.dtw import dtw, median_filter
from acestep_tpu.scoring.alignment import (
    MusicStampsAligner,
    SentenceTimestamp,
    TokenTimestamp,
    format_lrc,
)
from acestep_tpu.scoring.lyric_score import lyric_alignment_score
from acestep_tpu.scoring.lm_score import calculate_reward_score, sequence_logprob

__all__ = [
    "dtw",
    "median_filter",
    "MusicStampsAligner",
    "TokenTimestamp",
    "SentenceTimestamp",
    "format_lrc",
    "lyric_alignment_score",
    "calculate_reward_score",
    "sequence_logprob",
]
