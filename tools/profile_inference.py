"""Per-stage device-program profile of the fused inference pipeline.

Times, with amortized dispatch (N enqueues, one sync — the tunnel's
~33 ms/call dispatch otherwise swamps sub-50ms programs):

- graph build alone (voxel select + slab metadata, jitted)
- GNN forward alone (prebuilt graph)
- full fused program (unpack -> graph -> forward -> decode/top-k)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_inference.py
"""

import argparse
import time

import numpy as np


def timed(fn, *args, n=10, label=""):
    import jax

    out = fn(*args)  # compile
    jax.tree.map(
        lambda x: np.asarray(x).ravel()[:1], out
    )  # real sync (block_until_ready is a no-op on the tunnel)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print("%-28s %8.2f ms" % (label, dt))
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label_method", default="Car")
    ap.add_argument("--T", type=int, default=3)
    ap.add_argument("--points_per_beam", type=int, default=380)
    ap.add_argument("--num_points", type=int, default=24576)
    ap.add_argument("--num_keypoints", type=int, default=12288)
    ap.add_argument("--n", type=int, default=10)
    args = ap.parse_args()

    import jax

    from pointgnn_tpu import configs
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import InferencePipeline, select_input_features
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    cfg = configs.model_config(args.label_method, T=args.T)
    spec = db.spec_from_config(
        cfg, num_points=args.num_points, num_keypoints=args.num_keypoints,
        per_center_caps=(32, 192),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, use_box_score=False, device_spec=spec
    )
    points, _ = synthetic_lidar_frame(
        seed=0, points_per_beam=args.points_per_beam
    )
    feats = select_input_features(points.attr, pipe.input_features)
    packed = jax.device_put(
        db.pack_points(points.xyz, feats, spec.num_points)
    )
    print(
        "workload: %d raw points, spec P=%d K=%d, %s T=%d"
        % (len(points.xyz), spec.num_points, spec.num_keypoints,
           args.label_method, args.T)
    )

    build = jax.jit(
        lambda p: db.build_padded_graph(*db.unpack_points(p), spec)
    )
    timed(build, packed, n=args.n, label="graph build (slab meta)")

    graph = jax.device_put(jax.jit(
        lambda p: db.build_padded_graph(*db.unpack_points(p), spec)
    )(packed))
    model = pipe.model
    fwd = jax.jit(lambda params, g: model.apply(params, g))
    timed(fwd, pipe.params, graph, n=args.n, label="GNN forward")

    timed(
        pipe._device_fn, pipe.params, packed, n=args.n,
        label="full fused program",
    )


if __name__ == "__main__":
    main()
