"""5 Hz LM planner tests: tokenizer, FSM schema enforcement, two-phase
protocol, output parsing — all with the fallback tokenizer + tiny LM."""

import numpy as np
import pytest

import jax.numpy as jnp

from acestep_tpu.llm.fsm import MetadataFSM, TokenTables
from acestep_tpu.llm.handler import (
    LLMHandler, format_metadata_as_cot, parse_lm_output,
)
from acestep_tpu.llm.tokenizer import SimpleTokenizer


@pytest.fixture(scope="module")
def tok():
    return SimpleTokenizer(num_audio_codes=32)


@pytest.fixture(scope="module")
def tables(tok):
    return TokenTables(tok)


@pytest.fixture(scope="module")
def handler():
    h = LLMHandler(dtype=jnp.float32)
    h.initialize(num_fallback_codes=32, max_duration=600, seed=0)
    return h


# ------------------------------------------------------------------
# tokenizer
# ------------------------------------------------------------------


def test_tokenizer_roundtrip(tok):
    s = "<think>\nbpm: 120\n</think>\n<|audio_code_3|><|audio_code_7|>"
    assert tok.decode(tok.encode(s)) == s


def test_chat_template(tok):
    p = tok.apply_chat_template(
        [{"role": "system", "content": "S"}, {"role": "user", "content": "U"}],
        add_generation_prompt=True)
    assert p.endswith("<|im_start|>assistant\n")
    p2 = tok.apply_chat_template(
        [{"role": "user", "content": "U"},
         {"role": "assistant", "content": "<think>x</think>"}],
        add_generation_prompt=False)
    assert p2.endswith("<think>x</think>")


# ------------------------------------------------------------------
# FSM
# ------------------------------------------------------------------


def _drive_greedy(fsm, tok, choose):
    """Run the FSM forward choosing tokens with `choose(mask) -> token_id`."""
    emitted = []
    for _ in range(400):
        if fsm.finished:
            break
        m = fsm.next_mask()
        if m is None:
            break
        t = choose(m)
        fsm.advance(t)
        emitted.append(t)
    return tok.decode(emitted)


def test_fsm_emits_valid_schema(tables, tok):
    rng = np.random.default_rng(0)

    def choose(mask):
        ids = np.flatnonzero(mask)
        return int(rng.choice(ids))

    fsm = MetadataFSM(tables)
    text = _drive_greedy(fsm, tok, choose)
    assert text.startswith("<think>\n")
    assert "</think>" in text
    md = fsm.metadata()
    assert 30 <= int(md["bpm"]) <= 300
    assert 10 <= int(md["duration"]) <= 600
    assert int(md["timesignature"]) in (2, 3, 4, 6)
    # keyscale comes from the valid set
    assert md["keyscale"].split()[-1] in ("major", "minor")
    assert md["language"]


def test_fsm_user_metadata_injection(tables, tok):
    rng = np.random.default_rng(1)

    def choose(mask):
        return int(rng.choice(np.flatnonzero(mask)))

    fsm = MetadataFSM(tables, user_metadata={"bpm": 123, "duration": 45,
                                             "keyscale": "C major"})
    text = _drive_greedy(fsm, tok, choose)
    assert "bpm: 123\n" in text
    assert "duration: 45\n" in text
    assert "keyscale: C major\n" in text
    assert fsm.target_codes == 45 * 5


def test_fsm_codes_phase_blocks_eos(tables, tok):
    fsm = MetadataFSM(tables, phase="codes")
    fsm.begin_codes(target_duration=2)  # 10 codes
    m = fsm.next_mask()
    assert not m[tok.eos_token_id]
    code_ids = tables.code_ids
    for i in range(10):
        fsm.advance(int(code_ids[i % len(code_ids)]))
    m = fsm.next_mask()
    assert m[tok.eos_token_id]
    fsm.advance(tok.eos_token_id)
    assert fsm.finished


# ------------------------------------------------------------------
# parse / format
# ------------------------------------------------------------------


def test_parse_lm_output():
    text = ("<think>\nbpm: 73\ncaption: A calm piano melody\nduration: 273\n"
            "keyscale: G major\nlanguage: en\ntimesignature: 4\n</think>\n"
            "<|audio_code_1|><|audio_code_2|>")
    md, codes = parse_lm_output(text)
    assert md["bpm"] == 73 and md["duration"] == 273
    assert md["caption"] == "A calm piano melody"
    assert codes == "<|audio_code_1|><|audio_code_2|>"


def test_format_metadata_as_cot():
    cot = format_metadata_as_cot({"bpm": 120, "caption": "x", "duration": 30,
                                  "timesignature": "4/4"})
    assert cot.startswith("<think>\n")
    assert "timesignature: 4" in cot and "4/4" not in cot
    assert cot.endswith("</think>")


# ------------------------------------------------------------------
# end-to-end two-phase with tiny random LM
# ------------------------------------------------------------------


@pytest.mark.slow
def test_phase1_skipped_when_all_metas_pinned(handler, monkeypatch):
    """Reference llm_inference.py:1192,1208,1262: user-pinned
    bpm+keyscale+timesignature+duration (or use_cot_metas=False) skip the
    CoT decode entirely — metadata comes straight from the user and phase 2
    still emits duration*5 codes."""
    calls = []
    orig = handler.engine.generate_cot_device
    monkeypatch.setattr(
        handler.engine, "generate_cot_device",
        lambda *a, **k: calls.append(1) or orig(*a, **k))
    user = {"bpm": 120, "keyscale": "C major", "timesignature": 4,
            "duration": 3}
    out = handler.generate_with_stop_condition(
        "a song", "la", user_metadata=user, seed=1)
    assert not calls                         # no phase-1 decode ran
    assert out["metadata"]["bpm"] == 120
    assert out["cot_text"] == ""
    assert out["audio_codes"].count("<|audio_code_") == 15   # 3 s * 5 Hz

    # use_cot_metas=False skips phase 1 even with partial user metadata
    out2 = handler.generate_with_stop_condition(
        "a song", "la", infer_type="dit", user_metadata={"bpm": 99},
        use_cot_metas=False, seed=1)
    assert not calls
    assert out2["metadata"] == {"bpm": 99}

    # partial metadata with CoT metas on: phase 1 DOES run
    out3 = handler.generate_with_stop_condition(
        "a song", "la", infer_type="dit", user_metadata={"bpm": 99},
        seed=1)
    assert calls
    assert out3["metadata"]["bpm"] == 99


def test_plan_batch_skips_phase1_when_pinned(handler):
    user = {"bpm": 100, "keyscale": "D minor", "timesignature": 3,
            "duration": 2}
    plans = handler.plan_batch("a song", "la", n=3, user_metadata=user,
                               seed=5)
    assert len(plans) == 3
    for p in plans:
        assert p["metadata"]["duration"] == 2
        assert p["cot_text"] == ""
        assert p["audio_codes"].count("<|audio_code_") == 10  # 2 s * 5 Hz


def test_two_phase_generation(handler):
    res = handler.generate_with_stop_condition(
        "an upbeat track", "la la",
        user_metadata={"duration": 2},      # clamps to DURATION_MIN=10
        temperature=1.0, cfg_scale=2.0, seed=0, max_cot_tokens=300)
    md = res["metadata"]
    assert md["duration"] == 10
    assert 30 <= int(md["bpm"]) <= 300
    codes = res["audio_codes"]
    assert codes.count("<|audio_code_") >= 50
    assert "<think>" in res["cot_text"]


def test_phase1_only_for_dit(handler):
    res = handler.generate_with_stop_condition(
        "calm piano", "", infer_type="dit",
        user_metadata={"duration": 2}, seed=1, max_cot_tokens=300)
    assert res["audio_codes"] == ""
    assert res["metadata"]["duration"] == 10


def test_unconstrained_still_runs(handler):
    res = handler.generate_with_stop_condition(
        "x", "", infer_type="dit", constrained=False, seed=2,
        max_cot_tokens=16)
    assert "metadata" in res


def test_two_phase_with_int8_kv_cache():
    """kv_quant=True must run the full two-phase protocol (prefill graft,
    FSM-constrained CoT, codes decode) and emit a valid schema."""
    h = LLMHandler(dtype=jnp.float32)
    h.initialize(num_fallback_codes=32, max_duration=600, seed=0,
                 kv_quant=True)
    assert h.engine.kv_quant
    res = h.generate_with_stop_condition(
        "a quiet waltz", "hum hum", user_metadata={"duration": 2},
        temperature=1.0, cfg_scale=2.0, seed=0, max_cot_tokens=300)
    md = res["metadata"]
    assert md["duration"] == 10
    assert 30 <= int(md["bpm"]) <= 300
    assert res["audio_codes"].count("<|audio_code_") >= 50


def test_match_caption_genres():
    from acestep_tpu.llm.fsm import match_caption_genres

    vocab = ["synthwave", "lofi hip hop", "ambient", "pop rock"]
    assert match_caption_genres("a synthwave banger", vocab) == ["synthwave"]
    # word is a prefix of a multi-word genre
    assert match_caption_genres("some lofi beats", vocab) == ["lofi hip hop"]
    # multiple matches keep vocab order; no match -> empty
    assert match_caption_genres("ambient pop sounds", vocab) == \
        ["ambient", "pop rock"]
    assert match_caption_genres("trumpet fanfare", vocab) == []
    assert match_caption_genres("", vocab) == []
    assert match_caption_genres("synthwave", []) == []


def test_fsm_caption_priority_genres(tables, tok):
    rng = np.random.default_rng(3)

    def choose(mask):
        return int(rng.choice(np.flatnonzero(mask)))

    vocab = ["synthwave", "lofi", "ambient"]
    fsm = MetadataFSM(tables, genres_vocab=vocab, skip_genres=False,
                      caption="dreamy synthwave nights")
    _drive_greedy(fsm, tok, choose)
    assert fsm.metadata()["genres"] == "synthwave"


def test_unconstrained_chunked_stops_at_stop_string(handler):
    """The chunked (no-FSM) decode path truncates at the stop string even
    when it lands mid-chunk."""
    out = handler.engine.generate(
        ["<think>"], max_new_tokens=64, stop_strings=("\n",), seed=5,
        temperature=1.0)
    assert out.stop_reasons[0] in ("stop:\n", "eos", "length")
    if out.stop_reasons[0] == "stop:\n":
        assert out.texts[0].endswith("\n")


def test_genres_vocab_hot_reload(tmp_path):
    from acestep_tpu.llm.fsm import GenresVocab

    path = tmp_path / "genres_vocab.txt"
    path.write_text("synthwave\nlofi\n# comment\n\n")
    vocab = GenresVocab(str(path))
    assert vocab.get() == ["synthwave", "lofi"]
    import os, time
    time.sleep(0.01)
    path.write_text("ambient\n")
    os.utime(path)
    assert vocab.get() == ["ambient"]


@pytest.mark.slow
def test_fsm_mask_denies_padded_vocab():
    """Model vocab padded beyond the tokenizer: FSM constraint must cover
    the extra ids (they were previously always allowed)."""
    from acestep_tpu.config import LMConfig
    from acestep_tpu.llm.handler import LLMHandler
    from acestep_tpu.llm.tokenizer import SimpleTokenizer

    tok = SimpleTokenizer(num_audio_codes=8)
    cfg = LMConfig.tiny(vocab_size=tok.vocab_size + 32)   # padded vocab
    h = LLMHandler()
    h.initialize(tokenizer=tok, cfg=cfg)
    out = h.generate_with_stop_condition(
        "beat", "", infer_type="dit", constrained=True, seed=0,
        max_cot_tokens=220)
    # replay: every emitted token must be < tokenizer vocab (no padded ids)
    ids = tok.encode(out["cot_text"])
    assert all(i < tok.vocab_size for i in ids)
    assert out["metadata"].get("bpm")


def test_user_duration_clamped_into_schema(tables, tok):
    """A 0.8 s request must inject 'duration: 10', not 'duration: 0'
    (outside the schema the trie enforces)."""
    rng = np.random.default_rng(5)

    def choose(mask):
        return int(rng.choice(np.flatnonzero(mask)))

    fsm = MetadataFSM(tables, user_metadata={"duration": 0.8})
    text = _drive_greedy(fsm, tok, choose)
    assert "duration: 10\n" in text
    assert fsm.metadata()["duration"] == 10
    fsm2 = MetadataFSM(tables, user_metadata={"duration": 10000})
    text2 = _drive_greedy(fsm2, tok, choose)
    assert "duration: 600\n" in text2


def test_keyscale_trie_has_no_special_tokens(tables, tok):
    """Unicode accidentals must encode cleanly; trie edges never contain
    special tokens (observed '<|endoftext|>' inside a keyscale)."""
    ids = tok.encode("D♭ minor")
    assert tok.decode(ids) == "D♭ minor"
    fsm = MetadataFSM(tables)
    specials = {tok.eos_token_id, tok.pad_token_id}

    def walk(node, depth=0):
        for t, child in node.children.items():
            assert t not in specials, f"special token {t} on trie edge"
            if depth < 3:
                walk(child, depth + 1)

    walk(fsm._tries["keyscale"])


def test_token_tables_cover_added_tokens():
    """HF tokenizers exclude added tokens from vocab_size; the real
    checkpoints put <think>/<|audio_code_N|>/<|im_end|> exactly there.
    TokenTables must size by len(tokenizer), or the codes phase masks out
    every audio-code id and special ids crash table indexing."""

    class HFLike:
        """Mimics an HF fast tokenizer: vocab_size < len(tokenizer)."""

        def __init__(self):
            self.inner = SimpleTokenizer(num_audio_codes=16)
            # pretend everything from <think> up is an 'added token'
            self.vocab_size = self.inner._text_to_id["<think>"]
            self.eos_token_id = self.inner.eos_token_id

        def __len__(self):
            return self.inner.vocab_size

        def encode(self, text):
            return self.inner.encode(text)

        def decode(self, ids):
            return self.inner.decode(ids)

    tok = HFLike()
    tables = TokenTables(tok)
    assert tables.vocab_size == len(tok)
    assert len(tables.code_ids) == 16          # codes live above vocab_size
    think_ids = tok.encode("<think>")
    assert all(i < tables.vocab_size for i in think_ids)
    # FSM construction + first mask must not crash on added-token ids
    fsm = MetadataFSM(tables)
    assert fsm.next_mask() is not None


def test_fsm_trie_cache_reused_across_instances():
    tok = SimpleTokenizer(num_audio_codes=8)
    tables = TokenTables(tok)
    a = MetadataFSM(tables)
    b = MetadataFSM(tables)
    assert a._tries["bpm"] is b._tries["bpm"]
    assert a._tries["duration"] is b._tries["duration"]
    # different max_duration -> different cached trie
    c = MetadataFSM(tables, max_duration=120)
    assert c._tries["duration"] is not a._tries["duration"]


# ------------------------------------------------------------------
# round-4 review-sweep pins
# ------------------------------------------------------------------


def test_prompt_bucket_grows_beyond_ladder():
    """max_len > 4096 engines: the prefill delta bucket must keep growing
    (capping at the last rung silently truncated long prompts mid-prefill)."""
    from acestep_tpu.llm.generator import PROMPT_BUCKETS, _bucket

    assert _bucket(4096) == PROMPT_BUCKETS[-1]
    assert _bucket(4097) >= 4097
    assert _bucket(6000) >= 6000 and _bucket(6000) % 1024 == 0


def test_handler_max_len_scales_with_max_duration(handler):
    """A 600 s plan needs ~3008 code tokens ON TOP of the phase-2 prompt;
    the engine bound must leave real prompt headroom (the old fixed 4096
    deterministically rejected long-lyric 600 s plans)."""
    assert handler.engine.max_len >= 600 * 5 + 8 + 2048
    h = LLMHandler(dtype=jnp.float32)
    h.initialize(num_fallback_codes=32, max_duration=600, seed=0,
                 max_len=8192)
    assert h.engine.max_len == 8192


def test_disabled_fsm_never_consulted_for_masks(handler, monkeypatch):
    """constrained=False builds a disabled MetadataFSM for phase 2; decode
    must take the chunked scan, never the per-token masked path (which
    costs ~1 host round-trip per token on a tunneled device)."""
    from acestep_tpu.llm import fsm as fsm_mod

    def boom(self):
        raise AssertionError(
            "next_mask must not be called on the unconstrained path")

    monkeypatch.setattr(fsm_mod.MetadataFSM, "next_mask", boom)
    r = handler.generate_with_stop_condition(
        "cap", "", constrained=False, target_duration=2,
        max_code_tokens=4, seed=0)
    assert "raw" in r


def test_device_tables_upload_cached_per_tables_object(handler):
    """The ~1-2 MB FSM table upload happens once per host-table object,
    not once per planner request."""
    tables = handler._cot_tables({"duration": 30}, None, "cap")
    t1 = handler.engine._device_tables(tables)
    t2 = handler.engine._device_tables(tables)
    assert t1 is t2
    other = handler._cot_tables({"duration": 60}, None, "cap")
    assert handler.engine._device_tables(other) is not t1


def test_vocab_bound_shared_between_fsm_and_engine(handler, tok):
    """TokenTables mask sizing and LMEngine.vocab_use derive from the SAME
    bound (ids maskable-but-unsampleable otherwise)."""
    from acestep_tpu.llm.fsm import max_assigned_token_bound

    assert TokenTables(tok).vocab_size == max_assigned_token_bound(tok)
    hi = max_assigned_token_bound(handler.tokenizer,
                                  fallback=handler.cfg.vocab_size)
    assert handler.engine.vocab_use == min(handler.cfg.vocab_size,
                                           -(-hi // 128) * 128)
