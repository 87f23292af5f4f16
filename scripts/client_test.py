"""Live-server smoke client (reference: openrouter/client_test.py +
stress_test.py). Hits a running acestep_tpu API server end-to-end:
health -> models -> release_task -> poll -> download audio ->
chat/completions. Usage: python scripts/client_test.py --port 8019
[--stress N]."""

from __future__ import annotations

import argparse
import base64
import json
import http.client
import sys
import time


def call(host, port, method, route, body=None, timeout=600):
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    headers = {"Content-Type": "application/json"} if body is not None else {}
    conn.request(method, route,
                 json.dumps(body) if body is not None else None, headers)
    resp = conn.getresponse()
    raw = resp.read()
    conn.close()
    try:
        return resp.status, json.loads(raw.decode())
    except ValueError:
        return resp.status, raw


def run_one(host, port, duration=10.0, thinking=False):
    _, out = call(host, port, "POST", "/release_task", {
        "prompt": "an upbeat synthpop track", "lyrics": "[inst]",
        "audio_duration": duration, "thinking": thinking,
        "audio_format": "wav"})
    task_id = out["data"]["task_id"]
    t0 = time.time()
    while True:
        _, res = call(host, port, "POST", "/query_result",
                      {"task_id_list": [task_id]})
        entry = res["data"][0]
        if entry["status"] != 0:
            break
        time.sleep(0.5)
    wall = time.time() - t0
    assert entry["status"] == 1, entry
    item = json.loads(entry["result"])[0]
    status, audio = call(host, port, "GET",
                         f"/v1/audio?path={item['file']}")
    assert status == 200 and audio[:4] == b"RIFF", "audio download failed"
    return wall, len(audio)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8019)
    parser.add_argument("--duration", type=float, default=10.0)
    parser.add_argument("--stress", type=int, default=0,
                        help="submit N concurrent jobs and await all")
    args = parser.parse_args()

    status, out = call(args.host, args.port, "GET", "/health")
    assert status == 200, "health check failed"
    print("health ok:", out["data"])
    _, models = call(args.host, args.port, "GET", "/v1/models")
    print("models:", [m["name"] for m in models["data"]["models"]])

    wall, nbytes = run_one(args.host, args.port, args.duration)
    print(f"generate: {wall:.2f}s wall, {nbytes} audio bytes")

    if args.stress:
        ids = []
        for _ in range(args.stress):
            _, out = call(args.host, args.port, "POST", "/release_task", {
                "prompt": "stress", "lyrics": "[inst]",
                "audio_duration": args.duration, "thinking": False})
            ids.append(out["data"]["task_id"])
        t0 = time.time()
        pending = set(ids)
        while pending:
            _, res = call(args.host, args.port, "POST", "/query_result",
                          {"task_id_list": sorted(pending)})
            for entry in res["data"]:
                if entry["status"] != 0:
                    assert entry["status"] == 1, entry
                    pending.discard(entry["task_id"])
            time.sleep(0.5)
        print(f"stress x{args.stress}: {time.time()-t0:.2f}s total")

    # chat completion
    status, out = call(args.host, args.port, "POST", "/v1/chat/completions", {
        "messages": [{"role": "user",
                      "content": "<prompt>quick jingle</prompt>"
                                 "<lyrics>[inst]</lyrics>"}],
        "audio_config": {"duration": args.duration, "format": "wav"}})
    assert status == 200, out
    audio_url = out["choices"][0]["message"]["audio"][0]["audio_url"]["url"]
    audio = base64.b64decode(audio_url.split(",", 1)[1])
    print(f"chat completion: {len(audio)} audio bytes")
    print("ALL OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
