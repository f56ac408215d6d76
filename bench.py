"""End-to-end inference benchmark on the flagship car_auto_T3 model.

Measures per-frame latency of the full inference pipeline on synthetic
KITTI-density frames: host graph construction (C++ grid hash) + static
padding + jitted TPU forward + on-device box decode.  Baseline: the
reference implementation's published ~643 ms/frame end-to-end
(BASELINE.md; paper §5, Xeon E5-1630 + GTX 1070).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_MS = 643.0


def main():
    import jax

    from pointgnn_tpu import configs
    from pointgnn_tpu.graph import builder, pad
    from pointgnn_tpu.model import encodings
    from pointgnn_tpu.model.pointgnn import PointGNN
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    cfg = configs.model_config("Car", T=3)
    tpu = configs.tpu_settings("Car")
    cap = tpu["frame_capacity"]
    label_map = {"Background": 0, "Car": 1, "DontCare": 3}
    tables = encodings.build_class_tables(label_map)

    model = PointGNN(
        num_classes=cfg["num_classes"],
        box_encoding_len=7,
        layer_configs=cfg["model_kwargs"]["layer_configs"],
        mode="test",
    )
    params = model.init(jax.random.PRNGKey(0), input_dim=1)

    def device_fn(params, graph):
        logits, box_enc = model.apply(params, graph)
        probs = model.postprocess(logits)
        k = probs.shape[0]
        num_classes = probs.shape[1]
        # decode every (vertex, class) hypothesis on device
        # (run.py:264-291 reshape semantics)
        import jax.numpy as jnp

        cls_ids = jnp.tile(
            jnp.arange(num_classes, dtype=jnp.int32)[None, :], (k, 1)
        ).reshape(-1)
        xyz = jnp.repeat(
            graph.vertex_xyz[model.output_graph_level], num_classes, axis=0
        )
        decoded = encodings.classaware_decode_jax(
            cls_ids, xyz, box_enc.reshape(-1, 7), tables
        )
        return probs, decoded

    fwd = jax.jit(device_fn)

    # pre-generate frames (emulates dataset IO, excluded like the
    # reference's 'fetch input' stage vs its gen graph/gnn/nms stages)
    frames = []
    for i in range(8):
        pts, _ = synthetic_lidar_frame(seed=i)
        frames.append(pts)

    def run_frame(points, rng):
        vcl, kil, el = builder.gen_multi_level_local_graph_v3(
            points.xyz, **cfg["runtime_graph_gen_kwargs"], rng=rng
        )
        f = pad.FrameData(points.attr[:, :1], vcl, kil, el)
        g = pad.pad_frame(f, cap)
        probs, boxes = fwd(params, g)
        return probs, boxes

    rng = np.random.default_rng(0)
    # warmup / compile
    probs, boxes = run_frame(frames[0], rng)
    jax.block_until_ready((probs, boxes))

    times = []
    for i in range(16):
        t0 = time.perf_counter()
        probs, boxes = run_frame(frames[i % len(frames)], rng)
        jax.block_until_ready((probs, boxes))
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times) * 1e3)
    print(
        json.dumps(
            {
                "metric": "car_T3_e2e_inference_latency",
                "value": round(ms, 2),
                "unit": "ms/frame",
                "vs_baseline": round(BASELINE_MS / ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
