"""Interactive serving CLI (reference llava/serve/cli.py equivalent):
talks to a controller (or directly to a worker) over HTTP."""

from __future__ import annotations

import argparse

from video3d_tpu.serve.controller import _post_json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--controller", default="http://127.0.0.1:21001")
    parser.add_argument("--model", default="video3d-qwen2-7b")
    parser.add_argument("--video", required=True, help="e.g. scannet/scene0000_00")
    parser.add_argument("--max-new-tokens", type=int, default=512)
    args = parser.parse_args(argv)

    print(f"models: {_post_json(args.controller + '/list_models', {})['models']}")
    while True:
        try:
            prompt = input("user> ").strip()
        except EOFError:
            break
        if not prompt:
            continue
        out = _post_json(args.controller + "/worker_generate", {
            "model": args.model,
            "video": args.video,
            "prompt": f"<image>\n{prompt}",
            "max_new_tokens": args.max_new_tokens,
        }, timeout=600)
        print(f"assistant> {out.get('text', out)}")


if __name__ == "__main__":
    main()
