"""Generation-info timing summary parity.

Ports the reference's results-UI assertions
(`acestep/ui/gradio/events/results/generation_info_test.py`) and checks
the summary rides the /query_result entries end to end.
"""
import json

from acestep_tpu.utils.geninfo import build_generation_info
from tests.test_serving import _post, _wait_done, server_env  # noqa: F401


def test_basic_generation_info():
    info = build_generation_info(
        {"lm_time_cost": 2.5, "dit_total_time_cost": 7.5,
         "audio_conversion_time": 0.4, "auto_lrc_time": 0.6},
        num_audios=2, audio_format="flac")
    assert "generation time" in info.lower()
    assert "10.00s" in info                  # lm + dit total
    assert "5.00s per song" in info
    assert "LM phase (2 songs): 2.50s" in info
    assert "DiT phase (2 songs): 7.50s" in info
    assert "processing time" in info.lower()
    assert "to FLAC (2 songs): 0.40s" in info
    assert "LRC detection (2 songs): 0.60s" in info


def test_empty_time_costs_returns_empty():
    assert build_generation_info({}, num_audios=2) == ""
    assert build_generation_info(None, num_audios=2) == ""


def test_zero_audios_returns_empty():
    assert build_generation_info({"dit_total_time_cost": 5.0},
                                 num_audios=0) == ""


def test_wav32_format_label_and_singular_song():
    info = build_generation_info(
        {"dit_total_time_cost": 5.0, "audio_conversion_time": 0.2},
        num_audios=1, audio_format="wav32")
    assert "(1 song)" in info and "songs" not in info.replace("(1 song)", "")
    assert "WAV 32-bit" in info


def test_generation_info_in_query_result(server_env):
    """The REST results carry the timing summary and raw time_costs
    (reference api_server.py:2028-2056)."""
    _state, _handler, port = server_env
    status, out = _post(port, "/release_task",
                        {"prompt": "info test", "audio_duration": 1.0})
    assert status == 200
    task_id = out["data"]["task_id"]
    entry = _wait_done(port, task_id)
    items = json.loads(entry["result"])
    assert items, "no result entries"
    first = items[0]
    # the fake handler reports a diffusion cost; dit_total/summary derive
    assert "time_costs" in first
    assert isinstance(first["generation_info"], str)
