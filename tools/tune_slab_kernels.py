#!/usr/bin/env python3
"""Same-process sweep of slab-kernel block sizes on YOUR workload.

The shipped defaults (SLAB_DEFAULT_BLOCK_CENTERS x SLAB_DEFAULT_TILE,
nn/pallas_kernels.py) are the
v5e optimum at KITTI frustum density, but the right point depends on
point density, radii, and chip generation.  This tool streams a
synthetic (or user-density) workload through the fused program once
per (block_centers, tile) variant IN ONE PROCESS — the only valid way
to compare on tunneled backends (docs/PERF_NOTES.md "Measure in ONE
process") — re-measures the baseline at the end to rule out chip-state
drift, and prints the winning ``slab_tuning`` dict to pass to
``InferencePipeline``.

Usage:
    PYTHONPATH=. python tools/tune_slab_kernels.py \
        [--label_method Car] [--T 3] [--num_points 24576] \
        [--num_keypoints 12288] [--variants 32x32,16x32,32x64] \
        [--frames 24]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def parse_variants(text):
    """"32x32,16x32" -> [{"block_centers": 32, "tile": 32}, ...].

    A ``l0:`` / ``l1:`` prefix tunes one level only (InferencePipeline
    accepts ``{"level0": {...}, "level1": {...}}``): ``l0:16x32`` ->
    ``{"level0": {"block_centers": 16, "tile": 32}}``.
    """
    out = []
    for raw in text.split(","):
        tok = raw.strip().lower()
        if not tok:
            continue
        level = None
        if ":" in tok:
            level, _, tok = tok.partition(":")
            if level not in ("l0", "l1"):
                raise ValueError(
                    "bad variant %r: level prefix must be l0: or l1:"
                    % raw.strip()
                )
        parts = tok.split("x")
        if (
            len(parts) != 2
            or not all(p.isdigit() for p in parts)
            or not all(int(p) >= 1 for p in parts)
        ):
            raise ValueError(
                "bad variant %r: expected [l0:|l1:]BKxTILE with both "
                "sizes >= 1, e.g. 16x32" % raw.strip()
            )
        tuning = {"block_centers": int(parts[0]), "tile": int(parts[1])}
        if level:
            tuning = {{"l0": "level0", "l1": "level1"}[level]: tuning}
        out.append(tuning)
    return out


def stream_rate_ms(pipe, frames, n):
    seq = [frames[i % len(frames)] for i in range(n)]
    for _ in pipe.stream(seq[:4], raw=True):  # warm/compile
        pass
    t0 = time.perf_counter()
    for _ in pipe.stream(seq, raw=True):
        pass
    return (time.perf_counter() - t0) / n * 1e3


def sweep(config, spec, variants, frames, n):
    from pointgnn_tpu.infer import InferencePipeline

    def measure(tuning):
        pipe = InferencePipeline(
            config, on_device_graph=True, use_box_score=False,
            device_spec=spec, slab_tuning=tuning,
        )
        if not pipe.slab:
            import jax

            raise SystemExit(
                "slab kernels are inactive on this backend (%s): every "
                "variant would time the SAME edge-list program and the "
                "printed winner would be run-to-run noise. Run on TPU "
                "(or force slab wiring) before sweeping."
                % jax.default_backend()
            )
        return stream_rate_ms(pipe, frames, n)

    rows = [(None, measure(None))]
    for tuning in variants:
        rows.append((tuning, measure(tuning)))
    rows.append(("baseline-recheck", measure(None)))
    return rows


def main():
    parser = argparse.ArgumentParser(
        description="slab kernel block-size sweep"
    )
    parser.add_argument("--label_method", default="Car")
    parser.add_argument("--T", type=int, default=3)
    parser.add_argument("--num_points", type=int, default=24576)
    parser.add_argument("--num_keypoints", type=int, default=12288)
    parser.add_argument(
        "--variants", default="16x32,32x64,8x128",
        help="comma-separated BKxTILE list to try against the default",
    )
    parser.add_argument("--frames", type=int, default=24)
    args = parser.parse_args()
    try:  # fail on typos BEFORE paying TPU init + the chip probe
        variants = parse_variants(args.variants)
    except ValueError as exc:
        parser.error(str(exc))

    from pointgnn_tpu.utils.platform import honor_platform_env

    honor_platform_env()
    from pointgnn_tpu import configs
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.utils.chip import matmul_probe_tflops

    config = configs.model_config(args.label_method, T=args.T)
    spec = db.spec_from_config(
        config, num_points=args.num_points,
        num_keypoints=args.num_keypoints, per_center_caps=(32, 192),
    )
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    frames = []
    for i in range(8):
        pts, _ = synthetic_lidar_frame(seed=i, points_per_beam=380)
        frames.append(pts)

    probe0 = matmul_probe_tflops()
    print("chip probe: %.1f TF/s%s" % (
        probe0,
        "  (DEGRADED state — rankings may not transfer to the healthy "
        "state; re-run later)" if probe0 < 50 else "",
    ))
    rows = sweep(config, spec, variants, frames, args.frames)
    base = rows[0][1]
    best = min(rows[:-1], key=lambda r: r[1])

    from pointgnn_tpu.nn import pallas_kernels as pk

    def name_of(tuning):
        if tuning is None:
            return "default(%dx%d)" % (
                pk.SLAB_DEFAULT_BLOCK_CENTERS, pk.SLAB_DEFAULT_TILE,
            )
        if isinstance(tuning, str):
            return tuning
        if "block_centers" in tuning:
            return "%dx%d" % (tuning["block_centers"], tuning["tile"])
        return ",".join(
            "%s:%dx%d" % (lv, t["block_centers"], t["tile"])
            for lv, t in sorted(tuning.items())
        )

    for tuning, ms in rows:
        print("  %-18s %7.2f ms/frame  (%+5.1f%%)"
              % (name_of(tuning), ms, 100.0 * (ms - base) / base))
    print("chip probe after: %.1f TF/s" % matmul_probe_tflops())
    if best[0] is not None and best[1] < 0.97 * base:
        print("suggested slab_tuning: %s" % json.dumps(best[0]))
    else:
        print("default tuning stands (no variant beat it by >3%)")


if __name__ == "__main__":
    main()
