"""Entry point: python -m cge_tpu.app [--port N] [--scene NAME] [--size N].

The interactive counterpart of the reference's GUI branch
(/root/reference/src/main.cpp:55-477); the CLI batch mode lives in
cge_tpu.cli."""

from __future__ import annotations

import argparse

from cge_tpu.app.server import serve
from cge_tpu.app.state import AppState


def main():
    ap = argparse.ArgumentParser(description="cge_tpu interactive app")
    ap.add_argument("--port", type=int, default=8642)
    ap.add_argument("--scene", default="cornell_box")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--output-dir", default="/tmp/cge_out")
    args = ap.parse_args()
    state = AppState(scene=args.scene, width=args.size, height=args.size,
                     output_dir=args.output_dir)
    serve(state, port=args.port)


if __name__ == "__main__":
    main()
