"""ComfyUI package shim (ref: comfyui/__init__.py sets SPECIAL_TOKEN_PATH)."""

import os

os.environ.setdefault(
    "SPECIAL_TOKEN_PATH",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                 "example", "assets", "special_tokens.npz"),
)

from magi_tpu.comfyui.comfy_nodes import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
