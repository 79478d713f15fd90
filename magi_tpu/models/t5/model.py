"""T5 v1.1 encoder in JAX + text-embedding front end
(ref: inference/model/t5/t5_model.py).

The reference wraps HF `T5EncoderModel` (torch).  Here the encoder itself
is a jitted JAX function (MXU path) with a converter from the released
torch weights; the tokenizer stays the HF sentencepiece tokenizer
(host-side).  Caption cleaning mirrors the reference pipeline with
graceful degradation when ftfy/bs4 are absent.
"""

from __future__ import annotations

import dataclasses
import html
import os
import re
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6

    @classmethod
    def xxl(cls) -> "T5Config":
        return cls()

    @classmethod
    def from_hf_config(cls, d: dict) -> "T5Config":
        return cls(
            vocab_size=d.get("vocab_size", 32128),
            d_model=d["d_model"],
            d_kv=d["d_kv"],
            num_heads=d["num_heads"],
            d_ff=d["d_ff"],
            num_layers=d["num_layers"],
            rel_buckets=d.get("relative_attention_num_buckets", 32),
            rel_max_distance=d.get("relative_attention_max_distance", 128),
            layer_norm_epsilon=d.get("layer_norm_epsilon", 1e-6),
        )


def _rms_norm(x, weight, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps)).astype(x.dtype) * weight.astype(x.dtype)


def relative_position_bucket(rel_pos: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    """Bidirectional T5 bucketing (matches HF `_relative_position_bucket`)."""
    ret = np.zeros_like(rel_pos)
    num_buckets //= 2
    ret += (rel_pos > 0).astype(np.int64) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    ret += np.where(is_small, n, large)
    return ret


def position_bias_table(seq_len: int, cfg: T5Config) -> np.ndarray:
    """[seq, seq] bucket indices for the shared relative bias."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    return relative_position_bucket(mem - ctx, cfg.rel_buckets, cfg.rel_max_distance)


def _t5_prologue(params: dict, cfg: T5Config, input_ids: jnp.ndarray, attn_mask: jnp.ndarray):
    """Embedding lookup + [1, heads, L, L] masked relative-position bias."""
    L = input_ids.shape[1]
    h = params["shared"]["weight"][input_ids]
    buckets = jnp.asarray(position_bias_table(L, cfg), jnp.int32)
    bias = params["rel_bias"]["weight"][buckets]  # [L, L, heads]
    bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)
    neg = (1.0 - attn_mask.astype(jnp.float32))[:, None, None, :] * -1e9
    return h, bias + neg


def _t5_block(blk: dict, cfg: T5Config, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """One encoder block (pre-RMSNorm attention + gated-gelu FFN).  Shared
    by the scan-stacked forward and the host-streamed offload forward."""
    B, L = x.shape[0], x.shape[1]
    # self-attention (no 1/sqrt(d) scaling; folded into init as in T5)
    hn = _rms_norm(x, blk["ln1"], cfg.layer_norm_epsilon)
    q = (hn @ blk["q"]).reshape(B, L, cfg.num_heads, cfg.d_kv)
    k = (hn @ blk["k"]).reshape(B, L, cfg.num_heads, cfg.d_kv)
    v = (hn @ blk["v"]).reshape(B, L, cfg.num_heads, cfg.d_kv)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, -1)
    x = x + attn @ blk["o"]
    # gated-gelu FFN (v1.1)
    hn = _rms_norm(x, blk["ln2"], cfg.layer_norm_epsilon)
    g = jax.nn.gelu(hn @ blk["wi_0"], approximate=True)
    x = x + (g * (hn @ blk["wi_1"])) @ blk["wo"]
    return x


def t5_encoder_forward(params: dict, cfg: T5Config, input_ids: jnp.ndarray, attn_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, L] ids + mask -> [B, L, d_model] last hidden state."""
    h, bias = _t5_prologue(params, cfg, input_ids, attn_mask)

    def body(carry, blk):
        return _t5_block(blk, cfg, carry, bias), None

    h, _ = lax.scan(body, h, params["blocks"])
    h = _rms_norm(h, params["final_layer_norm"]["weight"], cfg.layer_norm_epsilon)
    return h


def init_t5_params(cfg: T5Config, seed: int = 0, dtype=jnp.float32) -> dict:
    rng = np.random.default_rng(seed)
    Lr = cfg.num_layers

    def w(*shape, stacked=True):
        s = (Lr,) + shape if stacked else shape
        return jnp.asarray(rng.standard_normal(s, dtype=np.float32) * 0.02, dtype)

    inner = cfg.num_heads * cfg.d_kv
    return {
        "shared": {"weight": w(cfg.vocab_size, cfg.d_model, stacked=False)},
        "rel_bias": {"weight": w(cfg.rel_buckets, cfg.num_heads, stacked=False)},
        "blocks": {
            "ln1": jnp.ones((Lr, cfg.d_model), dtype),
            "q": w(cfg.d_model, inner),
            "k": w(cfg.d_model, inner),
            "v": w(cfg.d_model, inner),
            "o": w(inner, cfg.d_model),
            "ln2": jnp.ones((Lr, cfg.d_model), dtype),
            "wi_0": w(cfg.d_model, cfg.d_ff),
            "wi_1": w(cfg.d_model, cfg.d_ff),
            "wo": w(cfg.d_ff, cfg.d_model),
        },
        "final_layer_norm": {"weight": jnp.ones((cfg.d_model,), dtype)},
    }


def convert_hf_t5_state(state: dict, cfg: T5Config, dtype=jnp.bfloat16) -> dict:
    """torch T5EncoderModel state_dict -> our pytree (weights transposed to
    [in, out])."""

    def t(name):
        arr = state[name]
        if hasattr(arr, "numpy"):
            arr = arr.float().numpy()
        return np.asarray(arr, np.float32)

    def stack(fmt, transpose=True):
        mats = [t(fmt.format(i)) for i in range(cfg.num_layers)]
        out = np.stack([m.T if transpose else m for m in mats])
        return jnp.asarray(out, dtype)

    pre = "encoder."
    return {
        "shared": {"weight": jnp.asarray(t("shared.weight"), dtype)},
        "rel_bias": {
            "weight": jnp.asarray(
                t(pre + "block.0.layer.0.SelfAttention.relative_attention_bias.weight"), dtype
            )
        },
        "blocks": {
            "ln1": stack(pre + "block.{}.layer.0.layer_norm.weight", transpose=False),
            "q": stack(pre + "block.{}.layer.0.SelfAttention.q.weight"),
            "k": stack(pre + "block.{}.layer.0.SelfAttention.k.weight"),
            "v": stack(pre + "block.{}.layer.0.SelfAttention.v.weight"),
            "o": stack(pre + "block.{}.layer.0.SelfAttention.o.weight"),
            "ln2": stack(pre + "block.{}.layer.1.layer_norm.weight", transpose=False),
            "wi_0": stack(pre + "block.{}.layer.1.DenseReluDense.wi_0.weight"),
            "wi_1": stack(pre + "block.{}.layer.1.DenseReluDense.wi_1.weight"),
            "wo": stack(pre + "block.{}.layer.1.DenseReluDense.wo.weight"),
        },
        "final_layer_norm": {"weight": jnp.asarray(t(pre + "final_layer_norm.weight"), dtype)},
    }


# per-layer HF key formats: our key -> (hf format, transpose) — shared by the
# stacked converter above and the block-offload slab writer below
_T5_LAYER_FMTS = {
    "ln1": ("encoder.block.{}.layer.0.layer_norm.weight", False),
    "q": ("encoder.block.{}.layer.0.SelfAttention.q.weight", True),
    "k": ("encoder.block.{}.layer.0.SelfAttention.k.weight", True),
    "v": ("encoder.block.{}.layer.0.SelfAttention.v.weight", True),
    "o": ("encoder.block.{}.layer.0.SelfAttention.o.weight", True),
    "ln2": ("encoder.block.{}.layer.1.layer_norm.weight", False),
    "wi_0": ("encoder.block.{}.layer.1.DenseReluDense.wi_0.weight", True),
    "wi_1": ("encoder.block.{}.layer.1.DenseReluDense.wi_1.weight", True),
    "wo": ("encoder.block.{}.layer.1.DenseReluDense.wo.weight", True),
}


class T5BlockStore:
    """Disk-backed converted encoder-layer slabs — the TPU-repo analog of the
    reference's low-RAM mode that keeps T5 blocks 12-23 as per-block files on
    disk and loads them per forward (ref: t5_model.py:50-84).  Slabs are
    written ONCE at init (converted, transposed, target dtype; bf16 stored as
    uint16 views since npz has no bf16) and streamed one layer at a time
    during encode — peak host RAM is resident-blocks + ONE slab."""

    def __init__(self, slab_dir: str, dtype):
        self.slab_dir = slab_dir
        self.dtype = dtype

    def path(self, i: int) -> str:
        return os.path.join(self.slab_dir, f"block_{i:02d}.npz")

    def write(self, i: int, blk: dict) -> None:
        os.makedirs(self.slab_dir, exist_ok=True)
        out = {}
        for k, v in blk.items():
            v = np.asarray(v)
            if v.dtype == jnp.bfloat16:
                out[k + "::bf16"] = v.view(np.uint16)
            else:
                out[k] = v
        tmp = self.path(i) + ".tmp"
        with open(tmp, "wb") as f:  # file handle: savez appends no suffix
            np.savez(f, **out)
        os.replace(tmp, self.path(i))

    def load(self, i: int) -> dict:
        with np.load(self.path(i)) as z:
            blk = {}
            for k in z.files:
                v = z[k]
                if k.endswith("::bf16"):
                    blk[k[: -len("::bf16")]] = jnp.asarray(v.view(jnp.bfloat16))
                else:
                    blk[k] = jnp.asarray(v)
        return blk


def convert_hf_t5_layer(getter, i: int, dtype) -> dict:
    """One encoder layer via a lazy `getter(hf_key) -> np.ndarray` (e.g. a
    safetensors handle) — avoids materializing the full state dict."""
    blk = {}
    for ours, (fmt, transpose) in _T5_LAYER_FMTS.items():
        arr = np.asarray(getter(fmt.format(i)), np.float32)
        blk[ours] = jnp.asarray(arr.T if transpose else arr, dtype)
    return blk


# ---------------------------------------------------------------------------
# caption cleaning (ref: t5_model.py:152-278)
# ---------------------------------------------------------------------------
#
# The regex constants below ARE the spec: the released checkpoints were
# trained on captions cleaned with exactly these rules (the widely-shared
# PixArt/DALLE cleaning pipeline), so producing the same cleaned string —
# byte for byte — is required for identical T5 embeddings and therefore
# identical videos.  Rule order matters and is preserved 1:1
# (golden-tested against the importable reference cleaner in
# tests/test_t5.py::test_clean_caption_matches_reference).

_BAD_PUNCT = re.compile(r"[#®•©™&@·º½¾¿¡§~\)\(\]\[\}\{\|\\/\*]{1,}")

# 31C0—31EF CJK Strokes .. 4E00—9FFF CJK Unified Ideographs
# (ref: t5_model.py:189-203 — seven unicode-block strips)
_CJK_BLOCKS = (
    r"[\u31c0-\u31ef]+",
    r"[\u31f0-\u31ff]+",
    r"[\u3200-\u32ff]+",
    r"[\u3300-\u33ff]+",
    r"[\u3400-\u4dbf]+",
    r"[\u4dc0-\u4dff]+",
    r"[\u4e00-\u9fff]+",
)

# all dash codepoints -> "-" (ref: t5_model.py:206-210)
_DASHES = (
    r"[\u002D\u058A\u05BE\u1400\u1806\u2010-\u2015\u2E17\u2E1A\u2E3A"
    r"\u2E3B\u2E40\u301C\u3030\u30A0\uFE31\uFE32\uFE58\uFE63\uFF0D]+"
)


def basic_clean(text: str) -> str:
    """(ref: t5_model.py:161-166).  ftfy is optional in this environment;
    its mojibake repair is identity on well-formed input."""
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return text.strip()


def clean_caption(caption: str) -> str:
    """Full mirror of the reference cleaning pipeline (ref:
    t5_model.py:167-278) — every rule, in the reference's order."""
    import urllib.parse as ul

    caption = str(caption)
    caption = ul.unquote_plus(caption)
    caption = caption.strip().lower()
    caption = re.sub("<person>", "person", caption)
    # urls (two passes: https?: and www: forms)
    caption = re.sub(
        r"\b((?:https?:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.](?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))",
        "",
        caption,
    )
    caption = re.sub(
        r"\b((?:www:(?:\/{1,3}|[a-zA-Z0-9%])|[a-zA-Z0-9.\-]+[.](?:com|co|ru|net|org|edu|gov|it)[\w/-]*\b\/?(?!@)))",
        "",
        caption,
    )
    # html
    try:
        from bs4 import BeautifulSoup

        caption = BeautifulSoup(caption, features="html.parser").text
    except ImportError:
        caption = re.sub(r"<[^>]+>", "", caption)
    # @<nickname>
    caption = re.sub(r"@[\w\d]+\b", "", caption)
    # CJK unicode blocks
    for block in _CJK_BLOCKS:
        caption = re.sub(block, "", caption)
    # all dash variants -> "-"; quotes to one standard
    caption = re.sub(_DASHES, "-", caption)
    caption = re.sub(r"[`´«»“”¨]", '"', caption)
    caption = re.sub(r"[‘’]", "'", caption)
    # html entities left after unescape
    caption = re.sub(r"&quot;?", "", caption)
    caption = re.sub(r"&amp", "", caption)
    # ip addresses
    caption = re.sub(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", " ", caption)
    # article ids at end
    caption = re.sub(r"\d:\d\d\s+$", "", caption)
    # literal \n
    caption = re.sub(r"\\n", " ", caption)
    # "#123", "#12345..", bare long digit runs, filenames
    caption = re.sub(r"#\d{1,3}\b", "", caption)
    caption = re.sub(r"#\d{5,}\b", "", caption)
    caption = re.sub(r"\b\d{6,}\b", "", caption)
    caption = re.sub(r"[\S]+\.(?:png|jpg|jpeg|bmp|webp|eps|pdf|apk|mp4)", "", caption)
    # repeated quotes/dots, bad punctuation, " . "
    caption = re.sub(r"[\"\']{2,}", r'"', caption)
    caption = re.sub(r"[\.]{2,}", r" ", caption)
    caption = _BAD_PUNCT.sub(r" ", caption)
    caption = re.sub(r"\s+\.\s+", r" ", caption)
    # this-is-my-cute-cat / this_is_my_cute_cat
    regex2 = re.compile(r"(?:\-|\_)")
    if len(re.findall(regex2, caption)) > 3:
        caption = re.sub(regex2, " ", caption)
    caption = basic_clean(caption)
    # alphanumeric id tokens (jc6640 / jc6640vc / 6640vc231)
    caption = re.sub(r"\b[a-zA-Z]{1,3}\d{3,15}\b", "", caption)
    caption = re.sub(r"\b[a-zA-Z]+\d+[a-zA-Z]+\b", "", caption)
    caption = re.sub(r"\b\d+[a-zA-Z]+\d+\b", "", caption)
    # commerce boilerplate
    caption = re.sub(r"(worldwide\s+)?(free\s+)?shipping", "", caption)
    caption = re.sub(r"(free\s)?download(\sfree)?", "", caption)
    caption = re.sub(r"\bclick\b\s(?:for|on)\s\w+", "", caption)
    caption = re.sub(r"\b(?:png|jpg|jpeg|bmp|webp|eps|pdf|apk|mp4)(\simage[s]?)?", "", caption)
    caption = re.sub(r"\bpage\s+\d+\b", "", caption)
    caption = re.sub(r"\b\d*[a-zA-Z]+\d+[a-zA-Z]+\d+[a-zA-Z\d]*\b", r" ", caption)  # j2d1a2a...
    # dimensions 123x456 (incl. cyrillic х and ×)
    caption = re.sub(r"\b\d+\.?\d*[xх×]\d+\.?\d*\b", "", caption)
    # punctuation spacing + whitespace collapse
    caption = re.sub(r"\b\s+\:\s+", r": ", caption)
    caption = re.sub(r"(\D[,\./])\b", r"\1 ", caption)
    caption = re.sub(r"\s+", " ", caption)
    # (the reference calls caption.strip() here without assignment — a
    # no-op kept out; the final strip below is the effective one)
    caption = re.sub(r"^[\"\']([\w\W]+)[\"\']$", r"\1", caption)
    caption = re.sub(r"^[\'\_,\-\:;]", r"", caption)
    caption = re.sub(r"[\'\_,\-\:\-\+]$", r"", caption)
    caption = re.sub(r"^\.\S+$", "", caption)
    return caption.strip()


def text_preprocessing(text: str, enabled: bool = True) -> str:
    if enabled:
        return clean_caption(clean_caption(text))
    return text.lower().strip()


class T5Embedder:
    """(ref: T5Embedder, t5_model.py:27-150).  Loads tokenizer + weights
    from a local directory (the reference's `t5_pretrained` layout)."""

    available_models = ["t5-v1_1-xxl"]
    _store = None  # class default: block offload off (also for __new__ uses)

    def __init__(
        self,
        cache_dir: str,
        model_max_length: int = 120,
        dtype=jnp.bfloat16,
        use_text_preprocessing: bool = True,
        device: str = "cpu",
        offload_blocks: int = 0,
    ):
        """`device` mirrors runtime_config.t5_device (ref: config.py:80):
        "cpu" runs the ~9GB T5-XXL on host CPU so it never competes with
        the DiT for HBM (measured 220 s/prompt at L=800 on a weak host —
        docs/perf_notes.md); anything else STAGES: params stay cached on
        host, are pushed to the accelerator per encode call, and the
        device copy is freed afterwards — T5 never holds HBM while the
        DiT walks (the reference frees the whole embedder instead via
        OFFLOAD_T5_CACHE, prompt_process.py; staging keeps the host copy
        warm).  `_exec_device` overrides the accelerator for tests."""
        import json

        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(cache_dir)
        self.model_max_length = model_max_length
        self.use_text_preprocessing = use_text_preprocessing
        if device == "auto":
            # staged accelerator encode when a TPU/GPU backend is live,
            # host CPU otherwise (config.runtime_config.t5_device docs)
            device = "cpu" if jax.default_backend() == "cpu" else "tpu"

        with open(os.path.join(cache_dir, "config.json")) as f:
            self.config = T5Config.from_hf_config(json.load(f))
        self._host = jax.devices("cpu")[0]
        if device == "cpu":
            self._device = self._host
        else:
            self._device = jax.devices()[0]
        # low-host-RAM block offload (ref: t5_model.py:50-84 keeps trailing
        # blocks as per-block files on disk): trailing `offload_blocks`
        # layers live in disk slabs and stream one at a time per encode
        if not offload_blocks:
            offload_blocks = int(os.environ.get("MAGI_T5_OFFLOAD_BLOCKS", "0"))
        self.n_offload = min(int(offload_blocks), self.config.num_layers)
        self.n_resident = self.config.num_layers - self.n_offload
        self._store = None
        if self.n_offload:
            assert self._device is self._host, (
                "offload_blocks targets low-RAM CPU hosts; with an "
                "accelerator the staged path already bounds HBM"
            )
        with jax.default_device(self._host):
            if self.n_offload:
                self.params = self._load_params_offload(cache_dir, dtype)
            else:
                self.params = self._load_params(cache_dir, dtype)
        # COMMIT params to host so the jit runs where its inputs live
        # (jit's `device=` arg is deprecated; committed-input placement is
        # the supported mechanism — _encode_ids device_puts per call)
        self.params = jax.device_put(self.params, self._host)
        cfgc = self.config
        self._forward = jax.jit(
            lambda p, ids, mask: t5_encoder_forward(p, cfgc, ids, mask)
        )
        if self._store is not None:
            self._prologue = jax.jit(lambda p, ids, mask: _t5_prologue(p, cfgc, ids, mask))
            self._layer_step = jax.jit(lambda blk, x, bias: _t5_block(blk, cfgc, x, bias))
            self._epilogue = jax.jit(
                lambda p, x: _rms_norm(
                    x, p["final_layer_norm"]["weight"], cfgc.layer_norm_epsilon
                )
            )

    def _load_params(self, path: str, dtype):
        state = {}
        import glob

        st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if st_files:
            from safetensors import safe_open

            for f in st_files:
                with safe_open(f, framework="np") as sf:
                    for k in sf.keys():
                        state[k] = sf.get_tensor(k)
        else:
            import torch

            bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
            assert bins, f"no T5 weights found under {path}"
            for b in bins:
                state.update(torch.load(b, map_location="cpu", weights_only=True))
        # encoder-only checkpoints may or may not carry the "encoder." prefix
        if not any(k.startswith("encoder.") for k in state):
            state = {("encoder." + k if not k.startswith("shared") else k): v for k, v in state.items()}
        return convert_hf_t5_state(state, self.config, dtype)

    def _load_params_offload(self, path: str, dtype) -> dict:
        """Low-host-RAM load: the first n_resident blocks stack in RAM; the
        trailing n_offload blocks are converted one layer at a time and
        written to disk slabs (once — reused across runs), never all
        resident together.  Peak RAM ~= resident params + ONE fp32 layer."""
        import glob

        cfg = self.config
        self._store = T5BlockStore(
            os.path.join(path, f"jax_block_slabs_{jnp.dtype(dtype).name}"), dtype
        )
        st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if st_files:
            from safetensors import safe_open

            handles = [safe_open(f, framework="np") for f in st_files]
            key_to_h = {k: h for h in handles for k in h.keys()}
            has_pre = any(k.startswith("encoder.") for k in key_to_h)

            def getter(name):
                if not has_pre and name.startswith("encoder."):
                    name = name[len("encoder."):]
                return key_to_h[name].get_tensor(name)
        else:
            # .bin fallback: torch deserializes whole files regardless, so
            # init peaks at the fp32 state size; slabs still bound ENCODE
            # memory (and later runs reuse them without this cost)
            import torch

            state = {}
            for b in sorted(glob.glob(os.path.join(path, "pytorch_model*.bin"))):
                state.update(torch.load(b, map_location="cpu", weights_only=True))
            if not any(k.startswith("encoder.") for k in state):
                state = {
                    ("encoder." + k if not k.startswith("shared") else k): v
                    for k, v in state.items()
                }

            def getter(name):
                v = state[name]
                return v.float().numpy() if hasattr(v, "numpy") else v

        for i in range(self.n_resident, cfg.num_layers):
            if not os.path.exists(self._store.path(i)):
                self._store.write(i, convert_hf_t5_layer(getter, i, dtype))

        resident = {k: [] for k in _T5_LAYER_FMTS}
        for i in range(self.n_resident):
            blk = convert_hf_t5_layer(getter, i, dtype)
            for k in resident:
                resident[k].append(blk[k])

        def g32(name):
            return jnp.asarray(np.asarray(getter(name), np.float32), dtype)

        params = {
            "shared": {"weight": g32("shared.weight")},
            "rel_bias": {
                "weight": g32(
                    "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
                )
            },
            "final_layer_norm": {"weight": g32("encoder.final_layer_norm.weight")},
        }
        if self.n_resident:
            params["blocks"] = {k: jnp.stack(v) for k, v in resident.items()}
        return params

    def get_text_embeddings(self, texts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(ref: t5_model.py:129-150).  Returns (embs [B,L,D], mask [B,L])."""
        texts = [text_preprocessing(t, self.use_text_preprocessing) for t in texts]
        tok = self.tokenizer(
            texts,
            max_length=self.model_max_length,
            padding="max_length",
            truncation=True,
            return_attention_mask=True,
            add_special_tokens=True,
            return_tensors="np",
        )
        embs = self._encode_ids(
            jnp.asarray(tok["input_ids"], jnp.int32),
            jnp.asarray(tok["attention_mask"], jnp.int32),
        )
        return embs, jnp.asarray(tok["attention_mask"], jnp.int32)

    def _encode_ids(self, ids, mask):
        with jax.default_device(self._device):
            if self._store is not None:
                return self._encode_offload(ids, mask)
            if self._device is self._host:
                return self._forward(self.params, ids, mask)
            # stage: host-cached params -> accelerator, encode, free the
            # device copy so T5 holds no HBM during the DiT walk
            dev_params = jax.device_put(self.params, self._device)
            ids = jax.device_put(ids, self._device)
            mask = jax.device_put(mask, self._device)
            embs = self._forward(dev_params, ids, mask)
            embs = jax.device_put(embs, self._host)
            embs.block_until_ready()
            del dev_params
        return embs

    def _encode_offload(self, ids, mask):
        """Host-streamed encode: resident layers slice from the stacked
        params; offloaded layers load from disk slabs one at a time and are
        freed after use (ref low-RAM block streaming, t5_model.py:50-84)."""
        p = self.params
        h, bias = self._prologue(p, ids, mask)
        for i in range(self.config.num_layers):
            if i < self.n_resident:
                blk = {k: p["blocks"][k][i] for k in _T5_LAYER_FMTS}
            else:
                blk = self._store.load(i)
            h = self._layer_step(blk, h, bias)
            del blk
        return self._epilogue(p, h)
