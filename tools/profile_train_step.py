#!/usr/bin/env python3
"""Stage-level latency attribution of the device-graph train step.

Companion to tools/profile_inference.py (the run.py time_dict
equivalent, reference run.py:536-540) for the TRAINING side: where do
the ~75 ms/frame of the production device-graph step
(bench.py bench_train_step_device) actually go?  Stages, each timed as
a pipelined rate on the real chip:

- ``chip_probe_tflops``: large-matmul rate stamp (healthy v5e >= 100,
  < 50 = degraded tunnel state; docs/PERF_NOTES.md).
- ``graph_build_ms``: the in-step on-device graph construction alone
  (device_builder.build_padded_graph via the trainer's builder).
- ``forward_ms``: model.apply on a prebuilt graph (slab fwd kernels +
  predictor), no loss.
- ``loss_ms``: forward + loss value (adds focal/huber + masks).
- ``grad_ms``: value_and_grad of the loss (adds the backward pass —
  slab custom-VJP kernels recompute the forward in-kernel, plus the
  dense bwd matmuls and the per-layer remat recompute).
- ``step_ms``: the full production step (graph build + grad + SGD
  apply + aux), exactly bench.py's number.

Derived deltas printed at the end attribute the step:
build = graph_build, fwd = forward, loss-only = loss - forward,
bwd = grad - loss, opt/fixed = step - grad - graph_build.

Usage:
    PYTHONPATH=. python tools/profile_train_step.py [--label_method Car]
        [--T 3] [--reps 12] [--json out.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def pipelined_rate_ms(fn, *args, reps=12):
    """n dispatches, one tiny fetch: compute-bound per-call rate."""
    import jax

    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps * 1e3


def profile(cfg, reps=12, probe=True, compute_dtype=None):
    import warnings

    import jax
    import numpy as np

    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import (
        input_feature_dim,
        select_input_features,
    )
    from pointgnn_tpu.model import encodings
    from pointgnn_tpu.model.pointgnn import get_model
    from pointgnn_tpu.parallel import step as step_lib
    from pointgnn_tpu.train import device_pipeline as dpipe
    from pointgnn_tpu.train import optimizers
    from pointgnn_tpu.train.trainer import loss_config
    from pointgnn_tpu.data.labels import LABEL_METHODS
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    out = {}
    if probe:
        from pointgnn_tpu.utils.chip import matmul_probe_tflops

        out["chip_probe_tflops"] = round(matmul_probe_tflops(), 1)

    dspec, model_extra = dpipe.resolve_device_setup(cfg, slab=True)
    enc_len = encodings.get_encoding_len(cfg["box_encoding_method"])
    if compute_dtype:
        model_extra = dict(model_extra, compute_dtype=compute_dtype)
    model = get_model(cfg["model_name"])(
        num_classes=cfg["num_classes"], box_encoding_len=enc_len,
        mode="train", **model_extra, **cfg["model_kwargs"],
    )
    builder = dpipe.make_graph_builder(
        dspec, model.output_graph_level, cfg
    )
    params = model.init(
        jax.random.PRNGKey(0),
        input_dim=input_feature_dim(cfg["input_features"]),
    )
    opt, _ = optimizers.build_from_train_config(
        {"initial_lr": 0.125, "decay_step": 400000,
         "decay_factor": 0.1, "optimizer": "sgd"}
    )
    state = step_lib.init_train_state(params, opt)
    step_fn = step_lib.make_train_step(
        model, opt, loss_config(cfg), mesh=None, graph_builder=builder,
        graph_rng_seed=0,
    )
    label_map, num_classes = LABEL_METHODS[cfg["label_method"]]
    pts, labels = synthetic_lidar_frame(seed=0, points_per_beam=380)
    feats = select_input_features(pts.attr, cfg["input_features"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        packed = db.pack_points(pts.xyz, feats, dspec.num_points)
    plabels = dpipe.dl.pack_frame_labels(labels, label_map, num_classes)
    frame = jax.device_put(dpipe.DeviceFrame(packed, plabels))
    params = jax.device_put(params)

    key = jax.random.fold_in(jax.random.PRNGKey(0), 0)

    build_fn = jax.jit(lambda b, k: builder(b, k))
    graph = build_fn(frame, key)
    out["graph_build_ms"] = round(
        pipelined_rate_ms(build_fn, frame, key, reps=reps), 2
    )

    fwd_fn = jax.jit(lambda p, g: model.apply(p, g))
    out["forward_ms"] = round(
        pipelined_rate_ms(fwd_fn, params, graph, reps=reps), 2
    )

    loss_fn = step_lib.make_loss_fn(model, loss_config(cfg))
    loss_val = jax.jit(lambda p, g: loss_fn(p, g)[0])
    out["loss_ms"] = round(
        pipelined_rate_ms(loss_val, params, graph, reps=reps), 2
    )

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    out["grad_ms"] = round(
        pipelined_rate_ms(grad_fn, params, graph, reps=reps), 2
    )

    # full production step: chain state like the real loop
    state, aux = step_fn(state, frame)
    float(np.asarray(aux["total_loss"]))
    t0 = time.perf_counter()
    for _ in range(reps):
        state, aux = step_fn(state, frame)
    float(np.asarray(aux["total_loss"]))
    out["step_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 2)

    out["attribution"] = {
        "graph_build": out["graph_build_ms"],
        "forward": out["forward_ms"],
        "loss_extra": round(out["loss_ms"] - out["forward_ms"], 2),
        "backward": round(out["grad_ms"] - out["loss_ms"], 2),
        "opt_and_fixed": round(
            out["step_ms"] - out["grad_ms"] - out["graph_build_ms"], 2
        ),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label_method", default="Car")
    ap.add_argument("--T", type=int, default=3)
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--no_probe", action="store_true")
    ap.add_argument("--compute_dtype", default="",
                    help="override the model compute dtype (e.g. "
                         "bfloat16) for the A/B; default keeps the "
                         "config's f32")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from pointgnn_tpu import configs

    cfg = configs.model_config(args.label_method, T=args.T)
    rep = profile(cfg, reps=args.reps, probe=not args.no_probe,
                  compute_dtype=args.compute_dtype or None)
    print(json.dumps(rep, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=2)


if __name__ == "__main__":
    main()
