"""Service-layer tests: routes exercised over real HTTP against the stdlib
server with generation mocked (the subprocess path is covered by e2e)."""

import base64
import io
import json
import os
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
import requests


@pytest.fixture()
def server(tmp_path, monkeypatch):
    from magi_tpu.serve import service

    monkeypatch.setattr(service, "OUT_DIR", str(tmp_path))

    def fake_generate(prompt, mode, image_path=None, **kw):
        out = tmp_path / "vid.mp4"
        out.write_bytes(b"\x00fakevideo")
        assert (mode == "i2v") == (image_path is not None)
        return {"success": True, "output_path": str(out), "duration": 0.1}

    monkeypatch.setattr(service, "generate_magi_video", fake_generate)

    def fake_batch(prompts, **kw):
        paths = []
        for i, _ in enumerate(prompts):
            out = tmp_path / f"vid_b{i}.mp4"
            out.write_bytes(b"\x00fakevideo")
            paths.append(str(out))
        return {"success": True, "output_paths": paths, "duration": 0.1}

    from magi_tpu.serve import generator

    monkeypatch.setattr(generator, "generate_magi_video_batch", fake_batch)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), service.MagiHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_ping_and_health(server):
    r = requests.get(f"{server}/ping", timeout=5).json()
    assert r["status"] == "ok"
    h = requests.get(f"{server}/health", timeout=5).json()
    assert "dependencies" in h and "status" in h


def test_openai_completions_roundtrip(server):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (8, 8), (200, 10, 10)).save(buf, format="PNG")
    data_uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    body = {
        "model": "magi-video-001",
        "messages": [
            {"role": "system", "content": [{"type": "text", "text": "sys"}]},
            {
                "role": "user",
                "content": [
                    {"type": "text", "text": "a red square"},
                    {"type": "image_url", "image_url": {"url": data_uri}},
                ],
            },
        ],
    }
    r = requests.post(f"{server}/v1/chat/completions", json=body, timeout=30)
    assert r.status_code == 200, r.text
    j = r.json()
    assert j["object"] == "chat.completion"
    url = j["choices"][0]["message"]["content"]
    vid = requests.get(url, timeout=5)
    assert vid.status_code == 200 and vid.content.startswith(b"\x00fakevideo")


def test_direct_generate(server):
    r = requests.post(f"{server}/generate", json={"prompt": "hello"}, timeout=30)
    assert r.status_code == 200, r.text
    j = r.json()
    assert j["success"] and j["download_url"].startswith("/download/")
    vid = requests.get(server + j["download_url"], timeout=5)
    assert vid.status_code == 200


def test_batch_generate(server):
    r = requests.post(f"{server}/generate", json={"prompts": ["a", "b"]}, timeout=30)
    assert r.status_code == 200, r.text
    j = r.json()
    assert j["success"] and len(j["download_urls"]) == 2
    for url in j["download_urls"]:
        vid = requests.get(server + url, timeout=5)
        assert vid.status_code == 200 and vid.content.startswith(b"\x00fakevideo")


def test_errors(server):
    assert requests.post(f"{server}/v1/chat/completions", json={"messages": []}, timeout=5).status_code == 400
    assert requests.post(f"{server}/generate", json={}, timeout=5).status_code == 400
    assert requests.get(f"{server}/download/nope.mp4", timeout=5).status_code == 404
    assert requests.get(f"{server}/bogus", timeout=5).status_code == 404


def test_check_dependencies():
    from magi_tpu.serve.generator import check_dependencies

    deps = check_dependencies()
    assert deps["jax"] and deps["entry_module"]
