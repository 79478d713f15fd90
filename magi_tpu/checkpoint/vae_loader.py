"""ViTVAE loading from the released diffusers-format checkpoint
(ref: AutoModel.from_pretrained, vae_model.py:336-361)."""

from __future__ import annotations

import json
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from magi_tpu.models.vae.model import VaeConfig, ViTVAE


def _read_weights(path: str) -> Dict[str, np.ndarray]:
    st = [
        f for f in os.listdir(path)
        if f.endswith(".safetensors") and ("diffusion" in f or "model" in f)
    ]
    state: Dict[str, np.ndarray] = {}
    if st:
        from safetensors import safe_open

        for fn in sorted(st):
            with safe_open(os.path.join(path, fn), framework="np") as f:
                for k in f.keys():
                    state[k] = f.get_tensor(k)
        return state
    import torch

    bins = [f for f in os.listdir(path) if f.endswith(".bin")]
    assert bins, f"no VAE weights under {path}"
    for fn in sorted(bins):
        sd = torch.load(os.path.join(path, fn), map_location="cpu", weights_only=True)
        state.update({k: v.float().numpy() for k, v in sd.items()})
    return state


def convert_vae_state(state: Dict[str, np.ndarray], cfg: VaeConfig, dtype=jnp.bfloat16) -> dict:
    def g(name):
        return np.asarray(state[name], np.float32)

    def stacked(fmt, n, transpose=True):
        mats = [g(fmt.format(i)) for i in range(n)]
        return jnp.asarray(np.stack([m.T if transpose else m for m in mats]), dtype)

    def stacked_lin(fmt, n, bias=True):
        p = {"weight": stacked(fmt + ".weight", n)}
        if bias and (fmt + ".bias").format(0) in state:
            p["bias"] = stacked(fmt + ".bias", n, transpose=False)
        return p

    def stacked_norm(fmt, n):
        return {"weight": stacked(fmt + ".weight", n, False), "bias": stacked(fmt + ".bias", n, False)}

    def lin(name, bias=True):
        p = {"weight": jnp.asarray(g(name + ".weight").T, dtype)}
        if bias and name + ".bias" in state:
            p["bias"] = jnp.asarray(g(name + ".bias"), dtype)
        return p

    def norm(name):
        return {"weight": jnp.asarray(g(name + ".weight"), dtype), "bias": jnp.asarray(g(name + ".bias"), dtype)}

    def tower(prefix: str, is_encoder: bool) -> dict:
        n = cfg.depth
        t = {
            "pos_embed": jnp.asarray(g(prefix + "pos_embed"), dtype),
            "blocks": {
                "attn": {
                    "qkv": stacked_lin(prefix + "blocks.{}.attn.qkv", n, bias=cfg.qkv_bias),
                    "proj": stacked_lin(prefix + "blocks.{}.attn.proj", n),
                },
                "norm2": stacked_norm(prefix + "blocks.{}.norm2", n),
                "mlp": {
                    "fc1": stacked_lin(prefix + "blocks.{}.mlp.fc1", n),
                    "fc2": stacked_lin(prefix + "blocks.{}.mlp.fc2", n),
                },
            },
            "norm": norm(prefix + "norm"),
        }
        if not cfg.ln_in_attn:
            t["blocks"]["norm1"] = stacked_norm(prefix + "blocks.{}.norm1", n)
        if cfg.with_cls_token:
            t["cls_token"] = jnp.asarray(g(prefix + "cls_token"), dtype)
        if is_encoder:
            t["patch_embed"] = {
                "proj": {
                    "weight": jnp.asarray(g(prefix + "patch_embed.proj.weight"), dtype),
                    "bias": jnp.asarray(g(prefix + "patch_embed.proj.bias"), dtype),
                }
            }
            t["last_layer"] = lin(prefix + "last_layer")
        else:
            t["proj_in"] = lin(prefix + "proj_in")
            if cfg.use_final_proj:
                t["final_proj"] = lin(prefix + "final_proj")
                t["final_norm"] = norm(prefix + "final_norm")
            t["last_layer"] = {
                "weight": jnp.asarray(g(prefix + "last_layer.weight"), dtype),
                "bias": jnp.asarray(g(prefix + "last_layer.bias"), dtype),
            }
        return t

    return {"encoder": tower("encoder.", True), "decoder": tower("decoder.", False)}


def load_vae(path: str, dtype=jnp.bfloat16) -> ViTVAE:
    config_path = os.path.join(path, "config.json")
    assert os.path.exists(config_path), f"Can't find a model config file at {config_path}."
    with open(config_path) as f:
        cd = json.load(f)
    assert cd["_class_name"] == "ViTVAE", cd.get("_class_name")
    cfg = VaeConfig.from_ddconfig(cd["ddconfig"])
    state = _read_weights(path)
    params = convert_vae_state(state, cfg, dtype)
    return ViTVAE(cfg, params)
