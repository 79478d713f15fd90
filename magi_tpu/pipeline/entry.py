"""CLI entry point (ref: entry.py:21-50). Same argument surface:

    python -m magi_tpu.pipeline.entry --config_file cfg.json --mode t2v \
        --prompt "..." --output_path out.mp4

TPU extension: `--prompts a b c` (t2v only) generates a batch of videos in
lockstep, dp-batched (one jitted denoise step serves the whole batch).
`--prompts ... --interleave` instead round-robins the requests through one
engine with decode on a worker thread (multi-request overlap on one chip,
the reference's PP multi-request analog).
"""

from __future__ import annotations

import argparse

from magi_tpu.pipeline.pipeline import MagiPipeline


def parse_args():
    parser = argparse.ArgumentParser(description="MAGI-TPU video generation")
    parser.add_argument("--config_file", type=str, required=True, help="magi config file (JSON)")
    parser.add_argument("--mode", type=str, choices=["t2v", "i2v", "v2v"], required=True)
    parser.add_argument("--prompt", type=str, default=None)
    parser.add_argument(
        "--prompts", type=str, nargs="+", default=None,
        help="batch of prompts (t2v only): generated in lockstep over the dp axis",
    )
    parser.add_argument("--image_path", type=str, default=None, help="first-frame image for i2v")
    parser.add_argument("--prefix_video_path", type=str, default=None, help="prefix video for v2v")
    parser.add_argument("--output_path", type=str, default="output.mp4")
    parser.add_argument(
        "--interleave", action="store_true",
        help="with --prompts: round-robin requests through one engine "
             "(decode overlaps denoise) instead of lockstep dp batching",
    )
    parser.add_argument(
        "--output_paths", type=str, nargs="+", default=None,
        help="per-prompt output paths for --prompts (default: output_path with _0.._N suffixes)",
    )
    args = parser.parse_args()
    assert args.prompt or args.prompts, "--prompt or --prompts required"
    return args


def main() -> None:
    args = parse_args()
    pipeline = MagiPipeline(args.config_file)
    if args.prompts:
        assert args.mode == "t2v", "--prompts batching supports t2v only"
        outs = args.output_paths
        if outs is None:
            stem, dot, ext = args.output_path.rpartition(".")
            outs = [f"{stem}_{i}{dot}{ext}" for i in range(len(args.prompts))]
        assert len(outs) == len(args.prompts)
        if args.interleave:
            pipeline.run_text_to_video_many(args.prompts, outs)
        else:
            pipeline.run_text_to_video_batch(args.prompts, outs)
    elif args.mode == "t2v":
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
