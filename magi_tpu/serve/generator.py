"""Subprocess-launching generation wrapper
(ref: magi_video_generator.py).  Each request runs in a fresh process for
failure isolation, exactly like the reference service."""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time
import uuid
from typing import Optional

DEFAULT_CONFIGS = {
    "4.5B": "example/4.5B/4.5B_base_config.json",
    "4.5B-distill": "example/4.5B/4.5B_distill_config.json",
    "24B": "example/24B/24B_base_config.json",
    "24B-distill": "example/24B/24B_distill_config.json",
}


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_dependencies() -> dict:
    """(ref: check_dependencies, magi_video_generator.py:22-52)."""
    deps = {"ready": False, "jax": False, "devices": 0, "entry_module": False, "errors": []}
    try:
        import jax

        deps["jax"] = True
        deps["jax_version"] = jax.__version__
        try:
            deps["devices"] = len(jax.devices())
            deps["backend"] = jax.default_backend()
        except Exception as e:  # no accelerator
            deps["errors"].append(f"device query failed: {e}")
    except ImportError as e:
        deps["errors"].append(f"jax import failed: {e}")
    try:
        import magi_tpu.pipeline.entry  # noqa: F401

        deps["entry_module"] = True
    except ImportError as e:
        deps["errors"].append(f"entry import failed: {e}")
    deps["ready"] = deps["jax"] and deps["entry_module"] and deps["devices"] > 0
    return deps


def _stream_output(proc: subprocess.Popen, show_progress: bool, sink: list) -> None:
    """(ref: _stream_output, magi_video_generator.py:55-97)."""

    def reader(stream, prefix):
        for line in iter(stream.readline, ""):
            sink.append(line)
            if show_progress:
                print(f"[magi:{prefix}] {line}", end="", file=sys.stderr)

    threads = [
        threading.Thread(target=reader, args=(proc.stdout, "out"), daemon=True),
        threading.Thread(target=reader, args=(proc.stderr, "err"), daemon=True),
    ]
    for t in threads:
        t.start()
    proc.wait()
    for t in threads:
        t.join(timeout=5)


_FRIENDLY_ERRORS = {
    "RESOURCE_EXHAUSTED": "Out of device memory — try a smaller model size or resolution",
    "weight dir not found": "Model checkpoint not downloaded — set runtime_config.load",
    "No module named": "Missing python dependency",
}


def generate_magi_video(
    prompt: str,
    mode: str = "t2v",
    image_path: Optional[str] = None,
    prefix_video_path: Optional[str] = None,
    model_size: str = "4.5B",
    gpus: int = 1,  # accepted for API compat; maps to TPU chips
    config_file: Optional[str] = None,
    output_dir: Optional[str] = None,
    show_progress: bool = True,
    timeout: Optional[float] = None,
) -> dict:
    """(ref: generate_magi_video, magi_video_generator.py:100-256)."""
    root = _repo_root()
    config_file = config_file or os.path.join(root, DEFAULT_CONFIGS.get(model_size, DEFAULT_CONFIGS["4.5B"]))
    output_dir = output_dir or os.getenv("OUT_DIR", "/tmp/magi_outputs")
    os.makedirs(output_dir, exist_ok=True)
    output_path = os.path.join(output_dir, f"magi_{uuid.uuid4().hex}.mp4")

    cmd = [
        sys.executable, "-m", "magi_tpu.pipeline.entry",
        "--config_file", config_file,
        "--mode", mode,
        "--prompt", prompt,
        "--output_path", output_path,
    ]
    if image_path:
        cmd += ["--image_path", image_path]
    if prefix_video_path:
        cmd += ["--prefix_video_path", prefix_video_path]

    env = dict(os.environ)
    # conditioning defaults, as the reference service sets (ref: :169-186)
    env.setdefault("PAD_HQ", "true")
    env.setdefault("PAD_DURATION", "true")
    env.setdefault("OFFLOAD_T5_CACHE", "true")
    env.setdefault("OFFLOAD_VAE_CACHE", "true")
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    return _launch(cmd, root, env, output_path, show_progress, timeout)


def generate_magi_video_batch(
    prompts: list,
    model_size: str = "4.5B",
    config_file: Optional[str] = None,
    output_dir: Optional[str] = None,
    show_progress: bool = True,
    timeout: Optional[float] = None,
    interleave: bool = False,
) -> dict:
    """Batch t2v: one subprocess, N prompts denoised in lockstep over the
    dp axis (TPU extension; the reference service is strictly one request
    per subprocess).  `interleave=True` instead round-robins the requests
    through one engine with decode on a worker thread (single-chip
    multi-request overlap).  Returns {"success", "output_paths": [...]}."""
    assert prompts
    root = _repo_root()
    config_file = config_file or os.path.join(root, DEFAULT_CONFIGS.get(model_size, DEFAULT_CONFIGS["4.5B"]))
    output_dir = output_dir or os.getenv("OUT_DIR", "/tmp/magi_outputs")
    os.makedirs(output_dir, exist_ok=True)
    outs = [os.path.join(output_dir, f"magi_{uuid.uuid4().hex}.mp4") for _ in prompts]

    cmd = [
        sys.executable, "-m", "magi_tpu.pipeline.entry",
        "--config_file", config_file,
        "--mode", "t2v",
        "--prompts", *prompts,
        "--output_paths", *outs,
    ]
    if interleave:
        cmd.append("--interleave")
    env = dict(os.environ)
    env.setdefault("PAD_HQ", "true")
    env.setdefault("PAD_DURATION", "true")
    env.setdefault("OFFLOAD_T5_CACHE", "true")
    env.setdefault("OFFLOAD_VAE_CACHE", "true")
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    result = _launch(cmd, root, env, outs[0], show_progress, timeout)
    if not result["success"]:
        return result
    finals = [p if os.path.exists(p) else p + ".npz" for p in outs]
    missing = [p for p in finals if not os.path.exists(p)]
    if missing:
        return {**result, "success": False, "error": f"missing outputs: {missing}"}
    return {**result, "output_paths": finals}


def _launch(cmd, root, env, output_path, show_progress, timeout) -> dict:
    t0 = time.time()
    lines: list = []
    try:
        proc = subprocess.Popen(
            cmd, cwd=root, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, bufsize=1,
        )
        if timeout:
            timer = threading.Timer(timeout, proc.kill)
            timer.start()
        else:
            timer = None
        _stream_output(proc, show_progress, lines)
        if timer:
            timer.cancel()
        duration = time.time() - t0
        stderr_tail = "".join(lines[-50:])
        if proc.returncode != 0 or not os.path.exists(output_path + ".npz") and not os.path.exists(output_path):
            error = None
            for pattern, friendly in _FRIENDLY_ERRORS.items():
                if pattern in stderr_tail:
                    error = friendly
                    break
            return {
                "success": False,
                "error": error or f"generation exited with code {proc.returncode}",
                "stderr": stderr_tail,
                "duration": duration,
            }
        final = output_path if os.path.exists(output_path) else output_path + ".npz"
        return {"success": True, "output_path": final, "duration": duration, "stderr": stderr_tail}
    except Exception as e:
        return {"success": False, "error": str(e), "stderr": "".join(lines[-50:]), "duration": time.time() - t0}
