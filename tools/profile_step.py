"""Per-fusion device-time attribution of the train step via jax.profiler.

Builds the SAME jitted train step as bench.py (same pbtxt, shapes, feed
path), traces N executions, aggregates device-side trace events by op
name, and maps the hottest fusions back to HLO metadata (op_name /
source line) from the compiled module. This replaces component-level
guessing: isolated sub-jits have repeatedly disagreed with in-situ cost
(BENCH_NOTES.md r4 items 9/10/15).

Usage: python tools/profile_step.py [--steps 8] [--shape bench] [--top 40]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(shape_name):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from cap2det_tpu.config import pbtxt, schema
    from cap2det_tpu.data import synthetic
    from cap2det_tpu.fields import InputFields
    from cap2det_tpu.models import registry
    from cap2det_tpu.train import trainer as trainer_lib
    import cap2det_tpu.models  # noqa: F401
    import __graft_entry__ as graft

    shape = bench.SHAPES[shape_name]
    batch_size, (h, w) = shape["batch"], shape["canvas_hw"]
    num_proposals, num_classes = shape["num_proposals"], shape["num_classes"]

    classes = ["class_%02d" % i for i in range(num_classes)]
    label_file = synthetic.write_label_file(
        os.path.join(tempfile.mkdtemp(prefix="prof_"), "labels.txt"), classes
    )
    model_cfg = schema.Model.from_dict(
        pbtxt.parse(graft._MODEL_PBTXT % label_file)["model"]
    )
    m = model_cfg.cap2det_model
    object.__setattr__(m, "oicr_iterations", bench.OICR_ITERATIONS)
    object.__setattr__(m.frcnn_options, "initial_crop_size", 14)
    train_pbtxt = (
        bench._FULL_FREEZE_TRAIN_PBTXT if shape["full_freeze"]
        else graft._TRAIN_PBTXT
    )
    train_config = schema.Pipeline.from_dict(
        pbtxt.parse(train_pbtxt)
    ).train_config
    model = registry.build(model_cfg, is_training=True,
                           compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    state, tx, _, mask = trainer_lib.TrainState.create(model, train_config,
                                                       rng)
    train_step = jax.jit(
        trainer_lib.make_train_step(model, tx, train_config, mask),
        donate_argnums=0,
    )

    rs = np.random.RandomState(0)
    y0 = rs.uniform(0, 0.5, (batch_size, num_proposals))
    x0 = rs.uniform(0, 0.5, (batch_size, num_proposals))
    host_batch = {
        InputFields.image: rs.uniform(
            0, 255, (batch_size, h, w, 3)
        ).astype(np.float32),
        InputFields.proposals: np.stack(
            [y0, x0, y0 + rs.uniform(0.1, 0.5, (batch_size, num_proposals)),
             x0 + rs.uniform(0.1, 0.5, (batch_size, num_proposals))], -1
        ).astype(np.float32),
        InputFields.num_proposals: np.full((batch_size,), num_proposals,
                                           np.int32),
        InputFields.pseudo_labels: (
            rs.rand(batch_size, num_classes) < 0.05
        ).astype(np.float32),
    }
    batch = jax.device_put(model.device_batch(host_batch))
    step_rng = jax.random.PRNGKey(1)
    return train_step, state, batch, step_rng


def _shape_elems(shape_str):
    dims = shape_str.split("[", 1)[1].rstrip("]")
    n = 1
    for d in dims.split(","):
        if d.strip().isdigit():
            n *= int(d)
    return n


def conv_table(hlo):
    """Per-convolution FLOPs from the compiled HLO, keyed by the
    enclosing fusion (or the bare convolution) instruction name.

    Joined with traced durations this answers WHICH convs run far from
    the chip's measured ~132 TFLOP/s conv ceiling — in-situ, not in the
    isolated sub-jits that repeatedly mis-ranked the blocks
    (BENCH_NOTES.md r4 items 9/15)."""
    shape_of = {}  # instruction name -> shape string
    for line in hlo.splitlines():
        md = re.search(r"%([\w.\-]+)\s*=\s*((?:\w+\[[\d,]*\]|\([^)]*\)))",
                       line)
        if md:
            shape_of[md.group(1)] = md.group(2)

    comp_convs = {}  # computation name -> [(flops, desc)]
    cur_comp = None
    fusion_of_comp = {}
    for line in hlo.splitlines():
        if line and not line.startswith(" ") and "{" in line:
            mname = re.match(r"^%?([\w.\-]+)", line.strip())
            cur_comp = mname.group(1) if mname else None
        mfus = re.search(r"%([\w.\-]+)\s*=.*fusion\(.*calls=%?([\w.\-]+)",
                         line)
        if mfus:
            fusion_of_comp[mfus.group(2)] = mfus.group(1)
        mconv = re.search(
            r"%([\w.\-]+)\s*=\s*(\w+\[[\d,]*\])[^=]*convolution\("
            r"[^)]*%([\w.\-]+)(?:\s+[^,]*)?,\s*[^)]*%([\w.\-]+)", line)
        if mconv:
            out_s = mconv.group(2)
            lhs_s = shape_of.get(mconv.group(3), "?")
            rhs_s = shape_of.get(mconv.group(4), "?")
            mwin = re.search(r"window=\{size=(\S+?)[\s}]", line)
            mdl = re.search(r"dim_labels=(\S+?)[,}\s]", line)
            dl = mdl.group(1) if mdl else "b01f_01io->b01f"
            try:
                out_e = _shape_elems(out_s)
                rhs_e = _shape_elems(rhs_s)
                # flops = 2 * |out| * |rhs| / |rhs output-feature extent|
                # (each output element contracts over kh*kw*cin rhs
                # elements; exact for fwd, grad-data and grad-filter
                # convs alike under their permuted dim_labels).
                rhs_dims = [int(x) for x in
                            rhs_s.split("[", 1)[1].rstrip("]").split(",")]
                rhs_labels = dl.split("_")[1].split("-")[0]
                o_pos = rhs_labels.index("o")
                flops = 2.0 * out_e * rhs_e / rhs_dims[o_pos]
            except Exception:
                flops = 0.0
            desc = "%s conv %s x %s -> %s %s" % (
                dl, lhs_s, rhs_s, out_s,
                "win=%s" % mwin.group(1) if mwin else "")
            comp_convs.setdefault(cur_comp, []).append((flops, desc))
    out = {}
    for comp, convs in comp_convs.items():
        key = fusion_of_comp.get(comp, comp)
        out.setdefault(key, []).extend(convs)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=8)
    parser.add_argument("--shape", default="bench")
    parser.add_argument("--top", type=int, default=40)
    parser.add_argument("--convs", action="store_true",
                        help="print per-convolution TFLOP/s table")
    parser.add_argument("--trace_dir", default="/tmp/step_trace")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    train_step, state, batch, step_rng = build_step(args.shape)

    # HLO text for fusion -> source mapping (compile before tracing).
    compiled = train_step.lower(state, batch, step_rng).compile()
    hlo = compiled.as_text()
    # instruction name -> metadata op_name/source. Every named HLO
    # instruction gets its own metadata; fusions fall back to the first
    # annotated instruction after their definition (their body).
    meta_of = {}
    cur = None
    for line in hlo.splitlines():
        mdef = re.search(r"%([\w.\-]+)\s*=", line)
        mm = re.search(r'metadata=\{op_name="([^"]+)"'
                       r'(?:.*?source_file="([^"]+)".*?source_line=(\d+))?',
                       line)
        label = None
        if mm:
            src = ""
            if mm.group(2):
                src = " %s:%s" % (os.path.basename(mm.group(2)), mm.group(3))
            label = mm.group(1)[:110] + src
        if mdef:
            cur = mdef.group(1)
            if label:
                meta_of[cur] = label
        elif label and cur and not meta_of.get(cur):
            meta_of[cur] = label

    state, logs = train_step(state, batch, step_rng)  # warm (already compiled)
    float(logs["loss/total_loss"].astype(jnp.float32))

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        state, logs = train_step(state, batch, step_rng)
        float(logs["loss/total_loss"].astype(jnp.float32))
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(
        os.path.join(args.trace_dir, "plugins/profile/*/*.trace.json.gz")
    ))
    with gzip.open(traces[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    # Device lanes: skip python host frames ($file.py) and runtime noise.
    skip = re.compile(r"^\$|^np\.|PjitFunction|ParseArguments|Transfer|"
                      r"check_scalar|_ensure|wrapper|stop_trace|start_trace")
    agg = {}
    for e in ev:
        if e.get("ph") != "X" or skip.search(e.get("name", "")):
            continue
        agg.setdefault(e["name"], [0.0, 0])
        agg[e["name"]][0] += e.get("dur", 0)
        agg[e["name"]][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for _, v in rows)
    print(json.dumps({"total_device_ms_per_step":
                      round(total / 1e3 / args.steps, 3)}))
    for name, (dur, cnt) in rows[:args.top]:
        print(json.dumps({
            "ms_per_step": round(dur / 1e3 / args.steps, 3),
            "count": cnt,
            "name": name[:60],
            "src": meta_of.get(name, meta_of.get(name.split(".")[0], ""))[:130],
        }))

    if args.convs:
        convs = conv_table(hlo)
        crows = []
        for name, items in convs.items():
            dur, cnt = agg.get(name, [0.0, 0])
            ms = dur / 1e3 / args.steps
            gflop = sum(f for f, _ in items) / 1e9
            crows.append((ms, gflop, name, items))
        crows.sort(key=lambda r: -r[0])
        print(json.dumps({"conv_total_ms": round(sum(r[0] for r in crows), 2),
                          "conv_total_gflop":
                          round(sum(r[1] for r in crows), 2)}))
        for ms, gflop, name, items in crows:
            if ms <= 0 and gflop <= 0:
                continue
            print(json.dumps({
                "ms_per_step": round(ms, 3),
                "gflop": round(gflop, 3),
                "tflops": round(gflop / ms, 1) if ms > 0 else None,
                "name": name[:50],
                "convs": [d[:150] for _, d in items],
            }))


if __name__ == "__main__":
    main()
