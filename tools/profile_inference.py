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


def _sync(out):
    """Fetch ONE small slice (a full device_get of a big output tree
    costs seconds over the ~10MB/s D2H tunnel and corrupts the timing;
    block_until_ready is a no-op on this backend)."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timed(fn, *args, n=10, label=""):
    out = fn(*args)  # compile
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
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
    ap.add_argument("--sweep", action="store_true",
                    help="sweep slab (block_centers, tile)")
    ap.add_argument("--no_layers", action="store_true",
                    help="skip the per-T layer attribution")
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
    spec_slab = spec._replace(slab_level1=True, slab_level0=True)
    print(
        "workload: %d raw points, spec P=%d K=%d, %s T=%d"
        % (len(points.xyz), spec.num_points, spec.num_keypoints,
           args.label_method, args.T)
    )

    build_slab = jax.jit(
        lambda p: db.build_padded_graph(*db.unpack_points(p), spec_slab)
    )
    timed(build_slab, packed, n=args.n, label="graph build (slab mode)")
    build = jax.jit(
        lambda p: db.build_padded_graph(*db.unpack_points(p), spec)
    )
    timed(build, packed, n=args.n, label="graph build (edge lists)")

    graph = jax.device_put(jax.jit(
        lambda p: db.build_padded_graph(*db.unpack_points(p), spec)
    )(packed))
    model = pipe.model
    fwd = jax.jit(lambda params, g: model.apply(params, g))
    timed(fwd, pipe.params, graph, n=args.n, label="GNN forward (T=%d)" % args.T)

    # per-layer attribution: rebuild with fewer GNN iterations; the
    # T->T-1 delta is one slab level-1 GNN layer, T=0 is set pooling +
    # predictor + graph build overheadless forward
    for t in range(0 if args.no_layers else args.T):
        sub_cfg = configs.model_config(args.label_method, T=t)
        sub_pipe = InferencePipeline(
            sub_cfg, on_device_graph=True, use_box_score=False,
            device_spec=spec,
        )
        timed(
            sub_pipe._device_fn, sub_pipe.params, packed, n=args.n,
            label="fused program T=%d" % t,
        )

    timed(
        pipe._device_fn, pipe.params, packed, n=args.n,
        label="full fused program",
    )

    if args.sweep:
        for bk in (8, 16, 32, 64):
            for tile in (64, 128, 256):
                try:
                    p = InferencePipeline(
                        cfg, on_device_graph=True, use_box_score=False,
                        device_spec=spec,
                        slab_tuning={"block_centers": bk, "tile": tile},
                    )
                    timed(
                        p._device_fn, p.params, packed, n=args.n,
                        label="sweep bk=%d tile=%d" % (bk, tile),
                    )
                except Exception as exc:
                    print("sweep bk=%d tile=%d FAILED: %r"
                          % (bk, tile, exc))


if __name__ == "__main__":
    main()
