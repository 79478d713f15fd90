"""ComfyUI node pack: protocol shape (no comfy runtime required)."""

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
