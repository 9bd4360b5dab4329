"""Synthesizes the passthrough 'pretrained' backbone checkpoint.

Stand-in for the ImageNet InceptionV2 warm start in zero-egress
environments (see cap2det_tpu/utils/passthrough_init.py): written in
the tools/convert_tf_checkpoint.py output layout so
`--pretrained_checkpoint` takes the identical code path a real
converted ImageNet checkpoint would (frcnn.load_pretrained overlay).

  python tools/make_passthrough_checkpoint.py --output /path/ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output", required=True)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from cap2det_tpu.models import frcnn, inception_v2
    from cap2det_tpu.train import checkpoint as ckpt_lib
    from cap2det_tpu.utils.passthrough_init import make_passthrough

    rng = jax.random.PRNGKey(args.seed)
    iv2 = {}
    iv2.update(make_passthrough(
        inception_v2.init_first_stage_params(rng)["InceptionV2"]
    ))
    iv2.update(make_passthrough(
        inception_v2.init_second_stage_params(rng)["InceptionV2"]
    ))
    ckpt_lib.save_params(args.output, {"InceptionV2": iv2})
    # Sanity: the overlay path accepts it.
    params = frcnn.init_params(
        rng,
        type("F", (), {"feature_extractor": type(
            "E", (), {"type": "faster_rcnn_inception_v2"})()})(),
    )
    frcnn.load_pretrained(params, ckpt_lib.restore_params(args.output))
    print("passthrough checkpoint written to %s" % args.output)


if __name__ == "__main__":
    main()
