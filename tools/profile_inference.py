#!/usr/bin/env python3
"""Stage-level latency profile of the fused inference program.

The reference prints a per-stage ``time_dict`` (run.py:536-540); this
is the equivalent diagnostic for the TPU pipeline, separating the
things a deployment can actually act on:

- ``chip_probe_tflops``: large-matmul rate — detects the tunneled
  chip's bistable slow state (docs/PERF_NOTES.md "Measure in ONE
  process"; healthy v5e >= 100, <50 means every number below is
  degraded by the environment).
- ``put_ms``: one host->device transfer round trip (flat ~33ms on the
  tunneled backend, ~1ms direct-attach) — the irreducible cold-start
  leg that ``stream()`` hides under compute.
- ``total/graph/gnn/tail_ms``: pipelined per-frame rates of the full
  fused program and its pieces (graph construction, GNN + predictor,
  unpack/softmax/top-k/decode).  The GNN share is the slab kernels —
  if ``gnn_ms`` dominates, tuning anything else is pointless.

Stages are timed as pipelined rates (n dispatches, one tiny fetch)
because per-dispatch sync stalls ~50ms on tunneled backends and
measures the link, not the program.

Usage:
    PYTHONPATH=. python tools/profile_inference.py [--label_method Car]
        [--T 3] [--num_points 24576] [--num_keypoints 12288] [--reps 16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def matmul_probe_tflops(n=4096, reps=10):
    """Shared chip-state probe (pointgnn_tpu/utils/chip.py) so this
    tool's stamp is comparable with bench.py's."""
    from pointgnn_tpu.utils.chip import matmul_probe_tflops as probe

    return probe(n, reps)


def pipelined_rate_ms(fn, *args, reps=16):
    """n dispatches, one tiny fetch: compute-bound per-call rate."""
    import jax

    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps * 1e3


def profile(config, spec=None, reps=16, probe=True):
    """Returns the stage dict for ``config`` (see module docstring)."""
    import warnings

    import jax
    import numpy as np

    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import InferencePipeline, select_input_features
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    if spec is None:
        spec = db.spec_from_config(
            config, num_points=24576, num_keypoints=12288,
            per_center_caps=(32, 192),
        )
    pipe = InferencePipeline(
        config, on_device_graph=True, use_box_score=False,
        device_spec=spec,
    )
    spec = pipe.device_spec
    pts, _ = synthetic_lidar_frame(seed=0, points_per_beam=380)
    feats = select_input_features(pts.attr, config["input_features"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        packed_host = db.pack_points(pts.xyz, feats, spec.num_points)
    packed_host = np.asarray(packed_host)

    out = {}
    if probe:
        out["chip_probe_tflops"] = round(matmul_probe_tflops(), 1)

    # one put + tiny-readback round trip (cold-start transfer leg)
    packed = jax.device_put(packed_host)
    jax.device_get(packed.ravel()[:1])  # warm the channel
    t0 = time.perf_counter()
    for _ in range(4):
        packed = jax.device_put(packed_host)
        jax.device_get(packed.ravel()[:1])
    out["put_ms"] = round((time.perf_counter() - t0) / 4 * 1e3, 2)

    total = pipelined_rate_ms(pipe._device_fn, pipe.params, packed,
                              reps=reps)

    build = jax.jit(
        lambda p: db.build_padded_graph(*db.unpack_points(p), spec)
    )
    graph_ms = pipelined_rate_ms(build, packed, reps=reps)
    graph = build(packed)

    apply_fn = jax.jit(lambda prm, g: pipe.model.apply(prm, g))
    gnn_ms = pipelined_rate_ms(apply_fn, pipe.params, graph, reps=reps)

    out.update(
        total_ms=round(total, 2),
        graph_ms=round(graph_ms, 2),
        gnn_ms=round(gnn_ms, 2),
        tail_ms=round(total - graph_ms - gnn_ms, 2),
        cold_frame_ms=round(out["put_ms"] + total, 2),
    )
    stats = getattr(jax.devices()[0], "memory_stats", lambda: None)()
    if stats and "bytes_in_use" in stats:
        out["hbm_in_use_mb"] = round(stats["bytes_in_use"] / 2 ** 20, 1)
        if "bytes_limit" in stats:
            out["hbm_limit_mb"] = round(
                stats["bytes_limit"] / 2 ** 20, 1
            )
    return out


def main():
    parser = argparse.ArgumentParser(
        description="fused-inference stage profile"
    )
    parser.add_argument("--label_method", default="Car")
    parser.add_argument("--T", type=int, default=3)
    parser.add_argument("--num_points", type=int, default=24576)
    parser.add_argument("--num_keypoints", type=int, default=12288)
    parser.add_argument("--reps", type=int, default=16)
    parser.add_argument(
        "--no-probe", action="store_true",
        help="skip the matmul chip-state probe",
    )
    args = parser.parse_args()

    from pointgnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    from pointgnn_tpu import configs
    from pointgnn_tpu.graph import device_builder as db

    config = configs.model_config(args.label_method, T=args.T)
    spec = db.spec_from_config(
        config, num_points=args.num_points,
        num_keypoints=args.num_keypoints, per_center_caps=(32, 192),
    )
    out = profile(config, spec, reps=args.reps, probe=not args.no_probe)
    out["label_method"] = args.label_method
    print(json.dumps(out))


if __name__ == "__main__":
    main()
