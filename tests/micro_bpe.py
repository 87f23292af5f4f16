"""Micro byte-level-BPE tokenizer fixture (VERDICT r3 weak #6).

Builds a REAL HF fast tokenizer (`tokenizers` BPE + ByteLevel, wrapped in
``PreTrainedTokenizerFast``) whose merges are trained on the planner
schema's value space — so digits merge into multi-char tokens ("12",
"120", ...), keyscale accidentals (♯/♭ — multi-BYTE UTF-8) merge with
their note letters, and language codes become single tokens. This is the
token topology the production Qwen3 tokenizer has and the char-level
``SimpleTokenizer`` structurally cannot express; the FSM trie / device
table suites run over BOTH (see test_fsm_device.py).

Reference behavior being exercised:
/root/reference/acestep/constrained_logits_processor.py:81-160 (token-level
prefix tries over the real BPE vocab).
"""

from __future__ import annotations

CHAT_TEMPLATE = (
    "{% for message in messages %}<|im_start|>{{ message['role'] }}\n"
    "{{ message['content'] }}"
    "{% if not loop.last or add_generation_prompt %}<|im_end|>\n{% endif %}"
    "{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
)


def build_micro_bpe(num_audio_codes: int = 32, vocab_size: int = 900):
    """A deterministic micro-BPE tokenizer over the planner schema."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    from acestep_tpu.constants import (
        KEYSCALE_ACCIDENTALS, KEYSCALE_MODES, KEYSCALE_NOTES,
        VALID_LANGUAGES, VALID_TIME_SIGNATURES,
    )

    corpus = [str(n) for n in range(0, 601)]
    corpus += ["bpm: ", "caption: ", "duration: ", "genres: ",
               "keyscale: ", "language: ", "timesignature: "]
    corpus += [f"{n}{a} {m}".replace("  ", " ")
               for n in KEYSCALE_NOTES
               for a in list(KEYSCALE_ACCIDENTALS) + [""]
               for m in KEYSCALE_MODES]
    corpus += list(VALID_LANGUAGES)
    corpus += [str(t) for t in VALID_TIME_SIGNATURES]
    corpus += ["an upbeat synth track", "write a song", "calm piano",
               "energetic metal", "# Caption", "# Lyric", "# Instruction",
               "[inst]", "la la", "dreamy synthwave nights ambient lofi"]

    tk = Tokenizer(models.BPE(unk_token=None))
    tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, show_progress=False,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        special_tokens=[])
    tk.train_from_iterator(corpus, trainer)

    hf = PreTrainedTokenizerFast(
        tokenizer_object=tk,
        eos_token="<|im_end|>", pad_token="<|endoftext|>")
    hf.add_special_tokens(
        {"additional_special_tokens": ["<|im_start|>", "<think>", "</think>"]})
    hf.add_tokens([f"<|audio_code_{i}|>" for i in range(num_audio_codes)],
                  special_tokens=True)
    hf.chat_template = CHAT_TEMPLATE
    return hf
