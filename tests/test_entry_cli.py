"""CLI argument plumbing (ref: entry.py:21-50) incl. the --prompts batch
extension."""

import sys

import pytest


@pytest.fixture()
def fake_pipe(monkeypatch):
    import magi_tpu.pipeline.entry as entry

    calls = {}

    class FakePipe:
        def __init__(self, cfg):
            calls["cfg"] = cfg

        def run_text_to_video(self, prompt, output_path):
            calls["t2v"] = (prompt, output_path)

        def run_text_to_video_batch(self, prompts, outs):
            calls["batch"] = (prompts, outs)

        def run_image_to_video(self, prompt, image_path, output_path):
            calls["i2v"] = (prompt, image_path, output_path)

    monkeypatch.setattr(entry, "MagiPipeline", FakePipe)
    return calls


def _run(monkeypatch, *argv):
    import magi_tpu.pipeline.entry as entry

    monkeypatch.setattr(sys, "argv", ["entry", *argv])
    entry.main()


def test_t2v_single(monkeypatch, fake_pipe):
    _run(monkeypatch, "--config_file", "c.json", "--mode", "t2v", "--prompt", "a cat",
         "--output_path", "o.mp4")
    assert fake_pipe["t2v"] == ("a cat", "o.mp4")


def test_t2v_batch_default_paths(monkeypatch, fake_pipe):
    _run(monkeypatch, "--config_file", "c.json", "--mode", "t2v",
         "--prompts", "a", "b", "--output_path", "out.mp4")
    assert fake_pipe["batch"] == (["a", "b"], ["out_0.mp4", "out_1.mp4"])


def test_t2v_batch_explicit_paths(monkeypatch, fake_pipe):
    _run(monkeypatch, "--config_file", "c.json", "--mode", "t2v",
         "--prompts", "a", "b", "--output_paths", "x.mp4", "y.mp4")
    assert fake_pipe["batch"] == (["a", "b"], ["x.mp4", "y.mp4"])


def test_prompt_required(monkeypatch, fake_pipe):
    with pytest.raises(AssertionError):
        _run(monkeypatch, "--config_file", "c.json", "--mode", "t2v")
