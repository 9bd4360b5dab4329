"""Detection-export CLI (reference train/export_results.py shape)."""

from __future__ import annotations

import argparse
import logging

from cap2det_tpu.config import schema
from cap2det_tpu.eval import export
from cap2det_tpu.train import checkpoint as ckpt_lib


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipeline_proto", required=True)
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--output_json", required=True)
    parser.add_argument("--max_examples", type=int, default=None)
    args = parser.parse_args()

    pipeline = schema.load_pipeline(args.pipeline_proto)
    manager = ckpt_lib.CheckpointManager(args.model_dir)
    state = manager.restore()
    manager.close()
    if state is None:
        raise SystemExit("no checkpoint in %s" % args.model_dir)
    params = state.get("ema") or state["params"]
    export.export_results(
        pipeline, params, args.output_json, max_examples=args.max_examples
    )


if __name__ == "__main__":
    main()
