"""ComfyUI node pack: protocol shape (no comfy runtime required)."""

import json

from magi_tpu.comfyui import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS


def test_node_protocol():
    assert set(NODE_CLASS_MAPPINGS) == set(NODE_DISPLAY_NAME_MAPPINGS)
    for name, cls in NODE_CLASS_MAPPINGS.items():
        assert callable(cls.INPUT_TYPES)
        spec = cls.INPUT_TYPES()
        assert "required" in spec
        assert isinstance(cls.RETURN_TYPES, tuple)
        assert hasattr(cls, cls.FUNCTION)


def test_prompt_loader_roundtrip():
    node = NODE_CLASS_MAPPINGS["MagiPromptLoader"]()
    assert node.load("hello") == ("hello",)


def test_process_overrides_and_dispatch(monkeypatch, tmp_path):
    """MagiProcess.process: the JSON overrides reach MagiPipeline's config
    and the mode selects the right pipeline entrypoint (pipeline mocked —
    the real walk is exercised on-chip, /tmp/magi_comfy_*.mp4)."""
    import magi_tpu.pipeline.pipeline as pipeline_mod

    calls = {}

    class FakePipeline:
        def __init__(self, config_path):
            with open(config_path) as f:
                calls["cfg"] = json.load(f)

        def run_text_to_video(self, prompt, out):
            calls["mode"] = ("t2v", prompt, out)

        def run_image_to_video(self, prompt, image_path, out):
            calls["mode"] = ("i2v", prompt, image_path, out)

        def run_video_to_video(self, prompt, video_path, out):
            calls["mode"] = ("v2v", prompt, video_path, out)

    monkeypatch.setattr(pipeline_mod, "MagiPipeline", FakePipeline)

    node = NODE_CLASS_MAPPINGS["MagiProcess"]()
    (out,) = node.process(
        "a red cube", "example/4.5B/4.5B_base_config.json", "t2v", seed=77,
        video_size_h=480, video_size_w=480, num_frames=48, num_steps=8, fps=12,
    )
    rc = calls["cfg"]["runtime_config"]
    assert (rc["seed"], rc["video_size_h"], rc["video_size_w"]) == (77, 480, 480)
    assert (rc["num_frames"], rc["num_steps"], rc["fps"]) == (48, 8, 12)
    assert calls["mode"] == ("t2v", "a red cube", out)
    assert out.endswith("magi_comfy_77.mp4")

    img = tmp_path / "x.png"
    img.write_bytes(b"\x89PNG")
    node.process(
        "p", "example/4.5B/4.5B_base_config.json", "i2v", seed=1,
        video_size_h=480, video_size_w=480, num_frames=24, num_steps=4, fps=12,
        image_path=str(img),
    )
    assert calls["mode"][0] == "i2v" and calls["mode"][2] == str(img)


def test_save_video_node(tmp_path):
    src = tmp_path / "in.mp4"
    src.write_bytes(b"fakevideo")
    dst = tmp_path / "out.mp4"
    node = NODE_CLASS_MAPPINGS["MagiSaveVideo"]()
    assert node.save(str(src), str(dst)) == (str(dst),)
    assert dst.read_bytes() == b"fakevideo"
