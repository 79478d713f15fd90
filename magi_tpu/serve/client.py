"""Python client for the MAGI-TPU video service (ref: magi_client.py).

    client = MagiVideoClient("http://localhost:8002")
    client.ping()
    path = client.generate_video_openai("a red fox", image_path="fox.png")
"""

from __future__ import annotations

import argparse
import base64
import os
from typing import Optional

import requests


def _image_to_data_uri(image_path: str) -> str:
    """(ref: magi_client.py:20-30)."""
    ext = os.path.splitext(image_path)[1].lstrip(".").lower() or "png"
    with open(image_path, "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    return f"data:image/{ext};base64,{b64}"


class MagiVideoClient:
    def __init__(self, base_url: str = "http://localhost:8002", timeout: float = 3600.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def ping(self) -> dict:
        return requests.get(f"{self.base_url}/ping", timeout=10).json()

    def health(self) -> dict:
        return requests.get(f"{self.base_url}/health", timeout=10).json()

    def generate_video_openai(
        self, prompt: str, image_path: Optional[str] = None, output_path: Optional[str] = None
    ) -> str:
        """OpenAI chat-completions style request; downloads the result and
        returns the local path."""
        content = [{"type": "text", "text": prompt}]
        if image_path:
            content.append({"type": "image_url", "image_url": {"url": _image_to_data_uri(image_path)}})
        resp = requests.post(
            f"{self.base_url}/v1/chat/completions",
            json={"model": "magi-video-001", "messages": [{"role": "user", "content": content}]},
            timeout=self.timeout,
        )
        resp.raise_for_status()
        url = resp.json()["choices"][0]["message"]["content"]
        return self.download(url, output_path)

    def generate_video_direct(
        self,
        prompt: str,
        image_path: Optional[str] = None,
        model_size: Optional[str] = None,
        gpus: Optional[int] = None,
        output_path: Optional[str] = None,
    ) -> str:
        payload = {"prompt": prompt}
        if image_path:
            payload["image_url"] = _image_to_data_uri(image_path)
        if model_size:
            payload["model_size"] = model_size
        if gpus:
            payload["gpus"] = gpus
        resp = requests.post(f"{self.base_url}/generate", json=payload, timeout=self.timeout)
        resp.raise_for_status()
        url = self.base_url + resp.json()["download_url"]
        return self.download(url, output_path)

    def generate_video_batch(
        self,
        prompts: list,
        model_size: Optional[str] = None,
        output_dir: Optional[str] = None,
    ) -> list:
        """TPU extension: N t2v prompts generated in one dp-batched walk."""
        payload = {"prompts": prompts}
        if model_size:
            payload["model_size"] = model_size
        resp = requests.post(f"{self.base_url}/generate", json=payload, timeout=self.timeout)
        resp.raise_for_status()
        out = []
        for i, url in enumerate(resp.json()["download_urls"]):
            dst = os.path.join(output_dir, os.path.basename(url)) if output_dir else None
            out.append(self.download(self.base_url + url, dst))
        return out

    def download(self, url: str, output_path: Optional[str] = None) -> str:
        output_path = output_path or os.path.basename(url)
        with requests.get(url, stream=True, timeout=self.timeout) as r:
            r.raise_for_status()
            with open(output_path, "wb") as f:
                for chunk in r.iter_content(1 << 20):
                    f.write(chunk)
        return output_path


def main() -> None:
    parser = argparse.ArgumentParser(description="MAGI-TPU video client")
    parser.add_argument("--url", default="http://localhost:8002")
    parser.add_argument("--prompt", required=True)
    parser.add_argument("--image", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--api", choices=["openai", "direct"], default="openai")
    parser.add_argument("--model_size", default=None)
    args = parser.parse_args()

    client = MagiVideoClient(args.url)
    print(client.ping())
    if args.api == "openai":
        path = client.generate_video_openai(args.prompt, args.image, args.output)
    else:
        path = client.generate_video_direct(args.prompt, args.image, args.model_size, output_path=args.output)
    print(f"saved: {path}")


if __name__ == "__main__":
    main()
