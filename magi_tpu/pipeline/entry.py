"""CLI entry point (ref: entry.py:21-50). Same argument surface:

    python -m magi_tpu.pipeline.entry --config_file cfg.json --mode t2v \
        --prompt "..." --output_path out.mp4
"""

from __future__ import annotations

import argparse

from magi_tpu.pipeline.pipeline import MagiPipeline


def parse_args():
    parser = argparse.ArgumentParser(description="MAGI-TPU video generation")
    parser.add_argument("--config_file", type=str, required=True, help="magi config file (JSON)")
    parser.add_argument("--mode", type=str, choices=["t2v", "i2v", "v2v"], required=True)
    parser.add_argument("--prompt", type=str, required=True)
    parser.add_argument("--image_path", type=str, default=None, help="first-frame image for i2v")
    parser.add_argument("--prefix_video_path", type=str, default=None, help="prefix video for v2v")
    parser.add_argument("--output_path", type=str, default="output.mp4")
    return parser.parse_args()


def main() -> None:
    args = parse_args()
    pipeline = MagiPipeline(args.config_file)
    if args.mode == "t2v":
        pipeline.run_text_to_video(prompt=args.prompt, output_path=args.output_path)
    elif args.mode == "i2v":
        assert args.image_path, "--image_path required for i2v"
        pipeline.run_image_to_video(prompt=args.prompt, image_path=args.image_path, output_path=args.output_path)
    elif args.mode == "v2v":
        assert args.prefix_video_path, "--prefix_video_path required for v2v"
        pipeline.run_video_to_video(
            prompt=args.prompt, prefix_video_path=args.prefix_video_path, output_path=args.output_path
        )


if __name__ == "__main__":
    main()
