"""Studio UI smoke tests.

No browser/node in the image, so this validates at two levels:
1. structure: tabs, all generation modes, endpoint references, i18n key
   coverage across all 4 languages, balanced JS delimiters;
2. behavior: drive the exact HTTP sequences the UI's JS issues (generate in
   every mode incl. extract/lego/complete, dice, LoRA panel, dataset build,
   training metrics) against a live tiny server.
"""

import json
import os
import re
import threading
import time
import wave

import numpy as np
import pytest

from acestep_tpu.config import DiTConfig, VAEConfig
from acestep_tpu.pipeline.handler import AceStepHandler
from acestep_tpu.serving import AppState, create_server
from tests.test_serving import _get, _post

STUDIO = os.path.join(os.path.dirname(__file__), "..", "acestep_tpu",
                      "serving", "studio.html")


@pytest.fixture(scope="module")
def page():
    with open(STUDIO, "r", encoding="utf-8") as f:
        return f.read()


def test_tabs_and_modes_present(page):
    for tab in ("tab-generate", "tab-lora", "tab-training", "tab-dataset",
                "tab-service"):
        assert f'id="{tab}"' in page
    for mode in ("Custom", "Simple", "Remix", "Repaint", "Extract", "Lego",
                 "Complete"):
        assert f'value="{mode}"' in page
    # base-model track selectors (reference constants TRACK_NAMES)
    assert '"vocals"' in page and '"drums"' in page
    # batch result navigation + scoring display
    assert "pg-prev" in page and "pg-next" in page
    assert "alignment_score" in page and "item.lrc" in page


def test_endpoints_referenced(page):
    for route in ("/release_task", "/query_result", "/create_random_sample",
                  "/format_input", "/v1/lora/load", "/v1/lora/unload",
                  "/v1/lora/toggle", "/v1/lora/scale", "/v1/lora/status",
                  "/v1/training/start", "/v1/training/stop",
                  "/v1/training/metrics", "/v1/training/tensorboard/start",
                  "/v1/dataset/build", "/v1/dataset/status",
                  "/v1/reinitialize", "/v1/stats", "/v1/models",
                  "/v1/audio"):
        assert route in page, f"UI missing endpoint {route}"


def test_i18n_coverage(page):
    # every data-i18n key must exist in all four language tables
    keys = set(re.findall(r'data-i18n="([a-z_0-9]+)"', page))
    assert len(keys) > 30
    for lang in ("en", "zh", "ja", "he"):
        block = re.search(lang + r":\s*\{(.*?)\n\s*\}", page, re.DOTALL)
        assert block, f"missing i18n table {lang}"
        lang_keys = set(re.findall(r"(\w+)\s*:", block.group(1)))
        missing = keys - lang_keys
        assert not missing, f"{lang} missing i18n keys: {missing}"


def test_js_delimiters_balanced(page):
    script = page.split("<script>")[1].split("</script>")[0]
    # strip string literals and template strings coarsely
    stripped = re.sub(r"`[^`]*`|\"[^\"\n]*\"|'[^'\n]*'", "", script)
    stripped = re.sub(r"//[^\n]*", "", stripped)
    for open_c, close_c in (("{", "}"), ("(", ")"), ("[", "]")):
        assert stripped.count(open_c) == stripped.count(close_c), \
            f"unbalanced {open_c}{close_c}"


# ------------------------------------------------------------------
# live-server behavior (the UI's fetch sequences)
# ------------------------------------------------------------------


@pytest.fixture(scope="module")
def live(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("studio")
    handler = AceStepHandler(
        dit_config=DiTConfig.tiny(fsq_dim=64),
        vae_config=VAEConfig.tiny(decoder_input_channels=64),
        frame_bucket=8, min_frames=8, refer_frames=8)
    handler.initialize_service()
    examples_dir = os.path.join(os.path.dirname(__file__), "..", "examples")
    state = AppState({"tiny": handler}, None,
                     output_dir=str(tmp_path / "out"),
                     examples_dir=examples_dir)
    server = create_server(state, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield handler, state, server.server_address[1], tmp_path
    state.shutdown()
    server.shutdown()
    server.server_close()


def _generate(port, body, timeout=120):
    status, out = _post(port, "/release_task", body)
    assert status == 200, out
    task_id = out["data"]["task_id"]
    deadline = time.time() + timeout
    while time.time() < deadline:
        _, res = _post(port, "/query_result", {"task_id_list": [task_id]})
        entry = res["data"][0]
        if entry["status"] != 0:
            return entry
        time.sleep(0.3)
    raise TimeoutError("generation did not finish")


def test_studio_page_served(live):
    import http.client

    _, _, port, _ = live
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/studio")
    resp = conn.getresponse()
    body = resp.read().decode("utf-8")
    assert resp.status == 200 and "tab-dataset" in body


@pytest.mark.parametrize("mode,extra", [
    ("text2music", {}),
    ("extract", {"track_name": "vocals"}),
    ("lego", {"track_name": "drums", "repainting_start": 0.0,
              "repainting_end": 0.2}),
    ("complete", {"track_classes": ["drums", "bass"]}),
])
def test_generate_modes_over_http(live, mode, extra):
    """The UI's generate body for each mode completes through the server."""
    _, _, port, _ = live
    body = {"prompt": "studio smoke", "lyrics": "[inst]",
            "audio_duration": 0.3, "inference_steps": 2,
            "task_type": mode, "seed": 3, "use_random_seed": False, **extra}
    entry = _generate(port, body)
    items = json.loads(entry["result"])
    assert entry["status"] == 1, items
    assert items[0]["file"] and os.path.exists(items[0]["file"])


def test_dice_endpoint_serves_examples(live):
    _, _, port, _ = live
    status, out = _post(port, "/create_random_sample",
                        {"sample_mode": "custom_mode"})
    assert status == 200
    assert out["data"].get("caption")
    status, out = _post(port, "/create_random_sample",
                        {"sample_mode": "simple_mode"})
    assert out["data"].get("description") or out["data"].get("caption")
