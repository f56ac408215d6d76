"""End-to-end inference benchmark on the flagship car_auto_T3 model.

Measures per-frame latency of the inference pipeline on synthetic
KITTI-density frames with fully on-device graph construction: the host
pads the raw point cloud (~0.2MB transfer), the device builds the
multi-level graph (voxel select + grid radius search), runs the GNN,
and decodes every (vertex, class) box hypothesis.  Measured stages:
graph/pad ('gen graph'), device program + readback ('gnn inference'),
hypothesis masking ('decode box') — the same stages dominating the
reference's ~643 ms/frame (BASELINE.md; paper §5, Xeon E5-1630 +
GTX 1070).  NMS is excluded on both sides (untrained weights make its
cost unrepresentative).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_MS = 643.0


def main():
    from pointgnn_tpu import configs
    from pointgnn_tpu.infer import InferencePipeline
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    cfg = configs.model_config("Car", T=3)
    pipe = InferencePipeline(cfg, on_device_graph=True, use_box_score=False)

    frames = [synthetic_lidar_frame(seed=i)[0] for i in range(8)]
    rng = np.random.default_rng(0)

    def measured_ms():
        td = pipe.time_dict
        return (
            td.get("gen graph", 0.0)
            + td.get("gnn inference", 0.0)
            + td.get("decode box", 0.0)
        ) * 1e3

    # warmup / compile
    pipe.run_frame(frames[0], rng)
    pipe.time_dict.clear()
    pipe.frames_done = 0

    times = []
    for i in range(16):
        before = measured_ms()
        pipe.run_frame(frames[i % len(frames)], rng)
        times.append(measured_ms() - before)
    ms = float(np.median(times))
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
