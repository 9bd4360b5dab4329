"""Fine-grained first-stage timing on TPU: stem pieces, each Mixed block,
and raw-conv references. Localizes the time inside first_stage (35.7ms
at bench shapes as of r2) to decide what to optimize.

Usage: python tools/bench_backbone_parts.py [--steps N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 2
H, W = 1024, 1536


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cap2det_tpu.models import inception_v2 as iv2

    n1, n2 = max(args.steps // 3, 1), args.steps
    rs = np.random.RandomState(0)

    from benchlib import slope_time

    def slope(fn, fargs):
        return slope_time(fn, fargs, steps=n2)

    def record(name, seconds, gflop=None):
        entry = {"part": name, "ms": round(seconds * 1e3, 3)}
        if gflop:
            entry["tflops_per_s"] = round(gflop / seconds / 1e3, 2)
        print(json.dumps(entry), flush=True)

    params = iv2.init_first_stage_params(jax.random.PRNGKey(0))["InceptionV2"]

    def bf(shape):
        return jax.device_put(
            rs.normal(0, 1, shape).astype(jnp.bfloat16)
        )

    # Raw conv references: what can this chip do on a plain conv?
    for (hh, ww, cin, cout, k) in [
        (256, 384, 64, 192, 3),
        (64, 96, 576, 192, 3),
        (64, 96, 576, 576, 1),
        (128, 192, 256, 256, 3),
    ]:
        x = bf((BATCH, hh, ww, cin))
        w = bf((k, k, cin, cout))
        f = jax.jit(
            lambda x, w: jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        )
        gflop = 2 * BATCH * hh * ww * cin * cout * k * k / 1e9
        record("conv%dx%d_%dx%d_%d_%d" % (k, k, hh, ww, cin, cout),
               slope(f, (x, w)), gflop)

    # Stem pieces.
    img = bf((BATCH, H, W, 3))
    f = jax.jit(lambda p, x: iv2._sep_conv_bn(p, x, 2, jnp.bfloat16))
    record("stem_sep7x7_s2", slope(f, (params["Conv2d_1a_7x7"], img)))

    x1 = bf((BATCH, H // 2, W // 2, 64))
    f = jax.jit(lambda x: iv2._pool(x, "pool_max", 3, 2))
    record("stem_maxpool1", slope(f, (x1,)))

    x2 = bf((BATCH, H // 4, W // 4, 64))
    f = jax.jit(
        lambda p, x: iv2._conv_bn(p["Conv2d_2c_3x3"],
                                  iv2._conv_bn(p["Conv2d_2b_1x1"], x, 1,
                                               jnp.bfloat16),
                                  1, jnp.bfloat16)
    )
    record("stem_conv2b_2c", slope(f, (params, x2)))

    x3 = bf((BATCH, H // 4, W // 4, 192))
    f = jax.jit(lambda x: iv2._pool(x, "pool_max", 3, 2))
    record("stem_maxpool2", slope(f, (x3,)))

    # Each Mixed block at its real shape.
    shapes = {
        "Mixed_3b": (H // 8, W // 8, 192),
        "Mixed_3c": (H // 8, W // 8, 256),
        "Mixed_4a": (H // 8, W // 8, 320),
        "Mixed_4b": (H // 16, W // 16, 576),
        "Mixed_4c": (H // 16, W // 16, 576),
        "Mixed_4d": (H // 16, W // 16, 576),
        "Mixed_4e": (H // 16, W // 16, 576),
    }
    for name, (hh, ww, cin) in shapes.items():
        x = bf((BATCH, hh, ww, cin))
        spec = iv2._BLOCKS_FIRST[name]
        f = jax.jit(
            lambda x, p, spec=spec: iv2._block(p, spec, x, jnp.bfloat16)
        )
        record(name, slope(f, (x, params[name])))

    # Pool flavors in isolation at block shape (are shifted slices slow?).
    xp = bf((BATCH, H // 16, W // 16, 576))
    f = jax.jit(lambda x: iv2._pool(x, "pool_avg", 3, 1))
    record("pool_avg_3x3_s1_4e", slope(f, (xp,)))
    f = jax.jit(lambda x: iv2._pool(x, "pool_max", 3, 1))
    record("pool_max_3x3_s1_4e", slope(f, (xp,)))
    f = jax.jit(
        lambda x: jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
        )
    )
    record("reduce_window_max_4e", slope(f, (xp,)))


if __name__ == "__main__":
    main()
