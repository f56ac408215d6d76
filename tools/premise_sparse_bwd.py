#!/usr/bin/env python3
"""Premise test: argmax-sparse backward for the slab train kernels.

VERDICT r4 #4 asks whether saving per-(center, hidden) argmax indices
in the forward could cut the device train step's backward below the
recompute design's ~3x-fwd-FLOPs-at-11x-overfetch bound
(docs/PERF_NOTES.md "Where the remaining 41 ms of backward goes";
max-aggregation semantics /root/reference/models/gnn.py:106-108).

Cost envelope argument: the gradient of a channel-wise max flows only
through that channel's argmax row, but with H_out (300) far above the
neighbors-per-center (~tens), the UNION over channels of argmax rows
is essentially ALL in-radius rows.  So a sparse backward cannot touch
fewer rows than the exact radius edge set, and its cost envelope is
edge-list-style segment math over exactly those edges — a path this
framework already has (device edge-list mode, radius_edges +
segment reductions).  Timing that path's backward at identical
workload therefore bounds what ANY argmax-save hybrid (slab forward
kernel + gather-based backward) could gain, without writing the
irregular kernel first.

A/B in one process at production train shapes:
- slab (production): forward / loss / value_and_grad
- edge list at matched density: same three, with cap-saturation
  counters so undersized caps can't silently shrink the workload; and
  with remat disabled so the comparison isolates the backward math
  (the shipped edge path remats, the slab path deliberately doesn't).

Interpretation: the hybrid's BEST case is
``slab_forward + (edge_grad - edge_loss)`` — the slab fwd kernel plus
the gather-backward's measured cost.  If that sum does not beat the
slab step's ``grad``, the premise is dead and the recompute design
stands.

Usage:
    PYTHONPATH=. python tools/premise_sparse_bwd.py [--T 3]
        [--label_method Car] [--reps 12] [--json out.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def profile_variant(cfg, slab, reps=12, remat=None, per_center_caps=None):
    """fwd/loss/grad rates for one train-path variant.

    ``per_center_caps`` overrides the edge-mode neighbor caps (the
    sparse-backward envelope needs caps covering the exact density);
    ``remat`` overrides the model's per-layer remat.
    """
    import warnings

    import jax
    import numpy as np

    from pointgnn_tpu.data.labels import LABEL_METHODS
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import (
        input_feature_dim,
        select_input_features,
    )
    from pointgnn_tpu.model import encodings
    from pointgnn_tpu.model.pointgnn import get_model
    from pointgnn_tpu.parallel import step as step_lib
    from pointgnn_tpu.train import device_pipeline as dpipe
    from pointgnn_tpu.train.trainer import loss_config
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_train_step import pipelined_rate_ms

    dspec, model_extra = dpipe.resolve_device_setup(cfg, slab=slab)
    if per_center_caps is not None:
        dspec = dspec._replace(
            level0=dspec.level0._replace(per_center_cap=per_center_caps[0]),
            level1=dspec.level1._replace(per_center_cap=per_center_caps[1]),
        )
    enc_len = encodings.get_encoding_len(cfg["box_encoding_method"])
    if remat is not None:
        model_extra = dict(model_extra, remat=remat)
    model = get_model(cfg["model_name"])(
        num_classes=cfg["num_classes"], box_encoding_len=enc_len,
        mode="train", edge_chunks=8, **model_extra, **cfg["model_kwargs"],
    )
    builder = dpipe.make_graph_builder(
        dspec, model.output_graph_level, cfg
    )
    params = model.init(
        jax.random.PRNGKey(0),
        input_dim=input_feature_dim(cfg["input_features"]),
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

    out = {"slab": bool(slab)}
    if not slab:
        # cap-saturation accounting: undersized caps would silently
        # shrink the edge workload below the slab's exact-graph density
        pxyz, f, mask = db.unpack_points(np.asarray(packed))
        _, counters = jax.jit(
            lambda x, f, m: db.build_padded_graph(
                x, f, m, dspec, return_counters=True
            )
        )(pxyz, f, mask)
        out["cap_counters"] = {
            k: int(v) for k, v in jax.device_get(counters).items()
        }
        out["per_center_caps"] = [
            dspec.level0.per_center_cap, dspec.level1.per_center_cap
        ]

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
    out["backward_ms"] = round(out["grad_ms"] - out["loss_ms"], 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label_method", default="Car")
    ap.add_argument("--T", type=int, default=3)
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--caps", type=int, nargs=2, default=(64, 320),
                    help="edge-mode per-center caps (L0, L1); must "
                         "cover the exact density or the counters "
                         "flag saturation")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    from pointgnn_tpu import configs
    from pointgnn_tpu.utils.chip import matmul_probe_tflops

    cfg = configs.model_config(args.label_method, T=args.T)
    rep = {"chip_probe_tflops": round(matmul_probe_tflops(), 1)}
    rep["slab"] = profile_variant(cfg, slab=True, reps=args.reps)
    rep["edge_remat"] = profile_variant(
        cfg, slab=False, reps=args.reps,
        per_center_caps=tuple(args.caps),
    )
    rep["edge_noremat"] = profile_variant(
        cfg, slab=False, reps=args.reps, remat=False,
        per_center_caps=tuple(args.caps),
    )
    # hybrid envelope: slab forward + the gather-backward's cost
    hybrid = rep["slab"]["loss_ms"] + rep["edge_noremat"]["backward_ms"]
    rep["hybrid_envelope_grad_ms"] = round(hybrid, 2)
    rep["slab_grad_ms"] = rep["slab"]["grad_ms"]
    rep["verdict"] = (
        "premise ALIVE: hybrid envelope beats slab grad"
        if hybrid < rep["slab"]["grad_ms"] * 0.9
        else "premise DEAD: gather-backward envelope does not beat the "
             "recompute design"
    )
    print(json.dumps(rep, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rep, f, indent=2)


if __name__ == "__main__":
    main()
