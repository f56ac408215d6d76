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

Also measures one full-capacity single-chip TRAIN step (car_auto_T3
capacity from configs.tpu_settings, remat + chunked edge streaming, the
production training configuration) — ms/step plus an MFU estimate from
XLA's compiled cost analysis — and emits provenance (jax version,
backend, device kind, which inference path actually ran) so recorded
numbers are attributable to an environment.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np

BASELINE_MS = 643.0

# TPU v5e peak: 197 TFLOP/s bf16, 98.5 TFLOP/s f32 (public spec). The
# train step runs f32 params with bf16 MXU matmuls; quote MFU against
# the bf16 peak (conservative).
V5E_PEAK_BF16 = 197e12


def _timed_steps(step_fn, state, batch, n=20):
    """Pipelined step timing: enqueue ``n`` steps (state chains on
    device), sync ONCE via a small device_get — the training loop's
    real cadence (trainer.train drains aux a few steps late;
    docs/PERF_NOTES.md: per-step sync stalls ~50ms on the tunnel and
    block_until_ready does not block).  Returns seconds/step."""
    import time as _time

    import numpy as _np

    t0 = _time.perf_counter()
    for _ in range(n):
        state, aux = step_fn(state, batch)
    float(_np.asarray(aux["total_loss"]))
    return (_time.perf_counter() - t0) / n


def bench_train_step(cfg):
    """Full-capacity single-chip train step: (ms/step, mfu_pct)."""
    import jax

    from pointgnn_tpu import configs
    from pointgnn_tpu.graph import builder, pad
    from pointgnn_tpu.model.pointgnn import PointGNN
    from pointgnn_tpu.parallel import step as pstep
    from pointgnn_tpu.train import optimizers
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    tpu = configs.tpu_settings("Car")
    cap = tpu["frame_capacity"]
    rng = np.random.RandomState(0)
    frames = []
    for i in range(tpu["frames_per_device"]):
        # SAME workload as the device-path train bench (realistic
        # KITTI frustum density) so the two train numbers compare
        # like-for-like; the old full-density synthetic frame
        # saturated every bucket here while the device path silently
        # truncated it to a 47-keypoint near-field sliver
        points = _bench_frame(i)
        vcl, kil, el = builder.gen_multi_level_local_graph_v3(
            points.xyz, **cfg["graph_gen_kwargs"],
            rng=np.random.default_rng(i),
        )
        k = len(vcl[-1])
        labels = rng.randint(0, cfg["num_classes"], (k, 1))
        frames.append(pad.FrameData(
            points.attr[:, :1].astype(np.float32), vcl, kil, el,
            cls_labels=labels,
            encoded_boxes=rng.rand(k, 1, 7).astype(np.float32),
            valid_boxes=(labels[:, :, None] == 1).astype(np.float32),
        ))
    import warnings

    with warnings.catch_warnings():
        # we measure the FULL-capacity step: the over-dense synthetic
        # frames deliberately saturate every bucket (worst case), so
        # the truncation warning is expected here
        warnings.simplefilter("ignore", RuntimeWarning)
        graph = pad.batch_and_pad(frames, cap)
    # device-resident input: the trainer's prefetch thread hides the
    # put in steady state; leaving this ~20MB padded union to the jit
    # dispatch would bill ~40 ms/step of transfer to the step time
    # (docs/PERF_NOTES.md round 4)
    graph = jax.device_put(graph)
    model = PointGNN(
        num_classes=cfg["num_classes"], box_encoding_len=7,
        layer_configs=cfg["model_kwargs"]["layer_configs"],
        regularizer_type="l1", regularizer_kwargs={"scale": 5e-7},
        mode="train",
    )
    params = model.init(jax.random.PRNGKey(0), input_dim=1)
    opt, _ = optimizers.build_from_train_config(
        {"initial_lr": 0.125, "decay_step": 400000,
         "decay_factor": 0.1, "optimizer": "sgd"}
    )
    state = pstep.init_train_state(params, opt)
    step_fn = pstep.make_train_step(model, opt, cfg["loss"], mesh=None)
    state, aux = step_fn(state, graph)  # compile
    float(np.asarray(aux["total_loss"]))  # real sync (block_until_ready
    #                                       is a no-op on the tunnel)
    step_s = _timed_steps(step_fn, state, graph, n=6)
    mfu = None
    try:
        cost = step_fn.lower(state, graph).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            mfu = 100.0 * flops / step_s / V5E_PEAK_BF16
    except Exception:
        pass
    return step_s * 1e3, mfu


def bench_train_step_device(cfg, frames_per_device=1):
    """Production TPU training config: device-graph + slab custom-VJP
    kernels (no edge lists).  Returns ms/step over ``frames_per_device``
    stacked frames (graph-union weighting inside the step when > 1,
    parallel/step.make_union_sums_fn)."""
    import jax

    from pointgnn_tpu import configs
    from pointgnn_tpu.data.labels import LABEL_METHODS
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import input_feature_dim, select_input_features
    from pointgnn_tpu.model import encodings
    from pointgnn_tpu.model.pointgnn import get_model
    from pointgnn_tpu.parallel import step as step_lib
    from pointgnn_tpu.train import device_pipeline as dpipe
    from pointgnn_tpu.train import optimizers
    from pointgnn_tpu.train.trainer import loss_config

    # shared resolution with trainer/evaluator (includes the halo keys
    # an earlier hand-rolled copy here had drifted away from)
    dspec, model_extra = dpipe.resolve_device_setup(cfg, slab=True)
    enc_len = encodings.get_encoding_len(cfg["box_encoding_method"])
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
        graph_rng_seed=0,  # per-step graph randomization (production)
        frames_per_device=frames_per_device,
    )
    label_map, num_classes = LABEL_METHODS[cfg["label_method"]]
    import warnings

    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    # realistic KITTI frustum density, same as the inference bench and
    # the edge-list train bench.  The old full-density frame (89K pts)
    # silently truncated to its FIRST 32K points — a 4x6m near-field
    # sliver with ~47 valid keypoints — so earlier device-train numbers
    # measured a near-empty graph.
    frames = []
    frame_pts = []
    for i in range(frames_per_device):
        pts, labels = synthetic_lidar_frame(seed=i, points_per_beam=380)
        frame_pts.append(pts)
        feats = select_input_features(pts.attr, cfg["input_features"])
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            packed = db.pack_points(pts.xyz, feats, dspec.num_points)
        plabels = dpipe.dl.pack_frame_labels(
            labels, label_map, num_classes
        )
        frames.append(dpipe.DeviceFrame(packed, plabels))
    frame = (
        frames[0] if frames_per_device == 1
        else dpipe.stack_frames(frames)
    )
    # device-resident input: the trainer prefetches + device_puts the
    # next batch on a worker thread (trainer.prepare_batch), so the
    # steady-state step never pays the ~2-3 ms in-dispatch put this
    # would otherwise measure (docs/PERF_NOTES.md round 4)
    frame = jax.device_put(frame)
    state, aux = step_fn(state, frame)  # compile
    float(np.asarray(aux["total_loss"]))  # real sync
    step_s = _timed_steps(step_fn, state, frame, n=20)
    # analytic MFU: XLA's cost_analysis can't see inside the Pallas
    # custom calls, so count the model FLOPs from first principles
    # (utils/flops.py) on this exact workload.  Train = 3x forward
    # (fwd + dense bwd); the per-layer remat recompute and the bwd
    # kernel's in-kernel forward recompute are EXCLUDED — this is the
    # conservative "useful FLOPs" convention, so the quoted MFU is a
    # floor on hardware utilization.
    mfu = None
    mfu_err = None
    try:
        useful = 0.0
        for fpts in frame_pts:
            useful += slab_accounting(cfg, dspec, fpts)["useful_fwd_flops"]
        mfu = 100.0 * 3.0 * useful / step_s / V5E_PEAK_BF16
    except Exception as exc:  # surfaced as train_device_mfu_error
        mfu_err = repr(exc)[:200]
    return step_s * 1e3, mfu, mfu_err


def _chip_matmul_tflops():
    """Chip-state stamp: healthy v5e >= 100 TF/s, < 50 degraded (one
    shared implementation, pointgnn_tpu/utils/chip.py)."""
    from pointgnn_tpu.utils.chip import matmul_probe_tflops

    return matmul_probe_tflops()


def slab_accounting(cfg, spec, points):
    """Analytic FLOP accounting for one frame through the slab paths.

    Builds the device graph ONCE (same code path as serving), fetches
    the cell metadata, and computes: exact in-radius pair counts (the
    uncapped graph the kernel reproduces), the kernel's actually-walked
    pair counts (host replica of its tile walk), and the model-level
    useful forward FLOPs.  See pointgnn_tpu/utils/flops.py."""
    import jax

    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import input_feature_dim, select_input_features
    from pointgnn_tpu.utils import flops

    spec = spec._replace(slab_level1=True, slab_level0=True)
    feats = select_input_features(points.attr, cfg["input_features"])
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        packed = db.pack_points(points.xyz, feats, spec.num_points)
    xyz, f, mask = db.unpack_points(packed)
    graph = jax.device_get(
        jax.jit(lambda x, f, m: db.build_padded_graph(x, f, m, spec))(
            xyz, f, mask
        )
    )
    p_xyz = np.asarray(graph.vertex_xyz[0])
    p_mask = np.asarray(graph.vertex_mask[0]) > 0
    k_xyz = np.asarray(graph.vertex_xyz[1])
    k_mask = np.asarray(graph.vertex_mask[1]) > 0
    pairs_l1 = flops.count_inradius_pairs(
        k_xyz[k_mask], k_xyz[k_mask], spec.level1.radius
    )
    pairs_l0 = flops.count_inradius_pairs(
        k_xyz[k_mask], p_xyz[p_mask], spec.level0.radius
    )
    useful = flops.pointgnn_forward_flops(
        cfg, input_feature_dim(cfg["input_features"]),
        int(p_mask.sum()), int(k_mask.sum()), pairs_l0, pairs_l1,
    )
    from pointgnn_tpu.nn import pallas_kernels as pk

    walks = {}
    for name, level, offs, cells in [
        ("l1", spec.level1, graph.slab_offsets, graph.slab_center_cell),
        ("l0", spec.level0, graph.slab0_offsets, graph.slab0_center_cell),
    ]:
        w = flops.slab_walk_pairs(
            np.asarray(offs), np.asarray(cells),
            db.slab_grid_of(level)[1],
            bk=pk.SLAB_DEFAULT_BLOCK_CENTERS, tile=pk.SLAB_DEFAULT_TILE,
            halo=level.slab_halo,
        )
        exact = pairs_l1 if name == "l1" else pairs_l0
        walks[name] = {
            "walked_pairs": w["walked_pairs"],
            "exact_pairs": exact,
            "overfetch_x": w["walked_pairs"] / max(exact, 1),
        }
    # kernel-executed FLOPs: walked pairs x per-pair remaining chain,
    # x num layers at that level
    layer_cfgs = cfg["model_kwargs"]["layer_configs"]
    gnn_cfgs = [
        lc for lc in layer_cfgs
        if lc["type"] == "scatter_max_graph_auto_center_net"
    ]
    gnn_layers = len(gnn_cfgs)
    # T=0 configs have no GNN layers: the L1 slab kernel never runs,
    # so its chain contributes nothing
    l1_chain = (
        flops.dense_chain_flops(
            1, gnn_cfgs[0]["kwargs"]["edge_MLP_depth_list"]
        )
        if gnn_cfgs else 0.0
    )
    # a config without a pooling layer has no L0 slab chain (mirrors
    # the T=0 GNN-layer guard above — don't let next() raise an opaque
    # StopIteration through the callers' except clauses)
    pool_cfg = next(
        (lc for lc in layer_cfgs
         if lc["type"] == "scatter_max_point_set_pooling"),
        None,
    )
    l0_chain = (
        flops.dense_chain_flops(
            1, pool_cfg["kwargs"]["point_MLP_depth_list"]
        )
        if pool_cfg is not None else 0.0
    )
    walked_flops = (
        gnn_layers * walks["l1"]["walked_pairs"] * l1_chain
        + walks["l0"]["walked_pairs"] * l0_chain
    )
    return {
        "useful_fwd_flops": useful,
        "walked_kernel_flops": walked_flops,
        "l1_overfetch_x": walks["l1"]["overfetch_x"],
        "l0_overfetch_x": walks["l0"]["overfetch_x"],
    }


def _bench_frame(seed):
    """Synthetic frame at real-KITTI frustum density.

    The default synthetic generator over-produces ~3x the density of a
    real HDL-64 frustum crop (~2000 points/beam/rev -> ~450 within the
    ~80 deg camera FOV); pack_points would truncate, which both warns
    and misrepresents the workload.  ~24K points matches the upper end
    of real frustum clouds (the reference's 643 ms is measured on
    exactly those, run.py:210-211 with downsample_by_voxel_size=null).
    """
    from pointgnn_tpu.utils.synthetic import synthetic_lidar_frame

    points, _ = synthetic_lidar_frame(seed=seed, points_per_beam=380)
    return points


def provenance(pipe):
    import jax

    dev = jax.devices()[0]
    return {
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "device": getattr(dev, "device_kind", str(dev)),
        "slab": pipe.slab,
        "pallas_tail": pipe.pallas_tail,
    }


def _redraw_if_degraded():
    """The tunneled chip's wall clock is bistable ACROSS PROCESSES (up
    to 4x — docs/PERF_NOTES.md "Measure in ONE process"); a run that
    draws the slow state reports latencies that say nothing about the
    code.  Probe up front and, if degraded, re-exec this script (a
    fresh process redraws the state) a bounded number of times.  The
    probe history rides along in an env var and lands in provenance, so
    a run that stayed degraded is still visibly stamped."""
    import sys

    import jax

    if jax.default_backend() == "cpu":
        return []
    history = json.loads(os.environ.get("POINTGNN_BENCH_PROBES", "[]"))
    max_attempts = int(os.environ.get("POINTGNN_BENCH_MAX_ATTEMPTS", "5"))
    try:
        probe = _chip_matmul_tflops()
    except Exception:
        return history
    history = history + [round(probe, 1)]
    if probe < 50.0 and len(history) < max_attempts:
        # escalating backoff (45s, 90s, 135s, ...): the slow state can
        # be a SUSTAINED episode, not just a per-process draw
        # (docs/PERF_NOTES.md round-3 observation), so later retries
        # wait longer for it to clear
        delay = 45.0 * len(history)
        print(
            "bench: chip probe %.1f TF/s < 50 (attempt %d/%d) — "
            "re-executing in %.0fs to redraw the bistable chip state"
            % (probe, len(history), max_attempts, delay),
            file=sys.stderr,
        )
        env = dict(os.environ, POINTGNN_BENCH_PROBES=json.dumps(history))
        time.sleep(delay)
        os.execve(
            sys.executable,
            [sys.executable, os.path.abspath(__file__)],
            env,
        )
    return history


def main():
    profile_dir = os.environ.get("POINTGNN_PROFILE_DIR", "")
    probe_history = _redraw_if_degraded()
    from pointgnn_tpu import configs
    from pointgnn_tpu.infer import InferencePipeline

    cfg = configs.model_config("Car", T=3)
    # capacity sized to the benchmark stream's density (the synthetic
    # frames peak at ~8.3K keypoints / ~190 max-capped neighbors; the
    # padded program still carries >1.3x headroom and runs overflow-free)
    from pointgnn_tpu.graph import device_builder as db

    spec = db.spec_from_config(
        cfg, num_points=24576, num_keypoints=12288,
        per_center_caps=(32, 192),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, use_box_score=False, device_spec=spec
    )

    frames = [_bench_frame(i) for i in range(8)]
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

    import contextlib

    import jax as _jax

    trace_cm = (
        _jax.profiler.trace(profile_dir)
        if profile_dir
        else contextlib.nullcontext()
    )
    times = []
    with trace_cm:
        for i in range(16):
            before = measured_ms()
            pipe.run_frame(frames[i % len(frames)], rng)
            times.append(measured_ms() - before)
    ms = float(np.median(times))

    # streaming throughput via the pipelined API: a prefetch thread
    # device_puts frames ahead so transfer latency overlaps compute and
    # the previous puts — the serving-relevant number.  NMS excluded
    # (untrained weights make its cost unrepresentative), so count only
    # the device round trip by disabling the host tail via max_hyp reuse.
    n_stream = 32
    stream_frames = [frames[i % len(frames)] for i in range(n_stream)]
    for _ in pipe.stream(stream_frames[:4], raw=True):  # warm the pipeline
        pass
    t0 = time.perf_counter()
    for _ in pipe.stream(stream_frames, raw=True):
        pass
    stream_ms = (time.perf_counter() - t0) / n_stream * 1e3

    # Headline = per-frame serving latency over a sequential dataset
    # run (the reference's 643 ms is exactly that: run.py's time_dict
    # totals / num frames over the val split).  pipe.stream() IS our
    # dataset loop — it prefetches the next frame's single H2D put
    # under the current frame's compute, which the tunneled backend's
    # ~33 ms flat put latency otherwise serializes into every frame.
    # The cold single-frame latency (put + compute + readback, nothing
    # to overlap) is reported alongside.
    out = {
        "metric": "car_T3_serving_latency",
        "value": round(stream_ms, 2),
        "unit": "ms/frame",
        "vs_baseline": round(BASELINE_MS / stream_ms, 2),
        "single_frame_ms": round(ms, 2),
        "single_frame_vs_baseline": round(BASELINE_MS / ms, 2),
        "provenance": provenance(pipe),
    }
    try:
        probe = _chip_matmul_tflops()
        out["provenance"]["chip_matmul_tflops"] = round(probe, 1)
        if probe_history:
            # probes from _redraw_if_degraded: one entry per process
            # attempt (the last is this process's pre-measurement draw)
            out["provenance"]["chip_probe_attempts"] = probe_history
        # the tunneled chip is bistable across processes (PERF_NOTES
        # "Measure in ONE process"); stamp degraded runs so
        # round-over-round comparisons don't mistake the slow lottery
        # for a code regression
        out["provenance"]["chip_state"] = (
            "ok" if probe >= 50.0 else "degraded"
        )
        if probe < 50.0:
            import sys

            print(
                "WARNING: chip matmul probe %.1f TF/s < 50 — this "
                "process drew the slow chip state; latency numbers in "
                "this run are not comparable to healthy-state rounds"
                % probe,
                file=sys.stderr,
            )
    except Exception:
        pass
    try:
        # decompose the cold single-frame number: on the tunneled
        # backend every synchronizing host<->device interaction pays a
        # flat RPC latency (~33 ms put ack in the degraded chip state),
        # which bounds the cold path from below regardless of kernel
        # speed — stream() (the headline) pipelines these away.  The
        # parts are measured in THIS process so they are comparable to
        # single_frame_ms above (PERF_NOTES "single-frame floor").
        from pointgnn_tpu.graph import device_builder as _db
        from pointgnn_tpu.infer import select_input_features as _sif

        packed = _db.pack_points(
            frames[0].xyz,
            _sif(frames[0].attr, pipe.input_features),
            spec.num_points,
        )
        put_ts, comp_ts, read_ts = [], [], []
        for _ in range(5):
            t0 = time.perf_counter()
            xdev = _jax.device_put(packed)
            _jax.block_until_ready(xdev)
            put_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            dev_out = pipe._device_fn(pipe.params, xdev)
            _jax.block_until_ready(dev_out)
            comp_ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _jax.device_get(dev_out)
            read_ts.append(time.perf_counter() - t0)
        out["single_frame_parts_ms"] = {
            "h2d_put": round(float(np.median(put_ts)) * 1e3, 2),
            "compute_sync": round(float(np.median(comp_ts)) * 1e3, 2),
            "d2h_readback": round(float(np.median(read_ts)) * 1e3, 2),
        }
    except Exception as exc:
        out["single_frame_parts_error"] = repr(exc)[:200]
    if os.environ.get("POINTGNN_BENCH_MFU", "1") != "0":
        try:
            acct = slab_accounting(cfg, spec, frames[0])
            # serving MFU: useful model FLOPs (exact uncapped graph,
            # folded formulation — utils/flops.py) over the pipelined
            # per-frame serving latency.  cost_analysis() cannot see
            # Pallas custom-call FLOPs, hence the analytic count.
            out["infer_useful_gflop_per_frame"] = round(
                acct["useful_fwd_flops"] / 1e9, 1
            )
            out["infer_serving_mfu_pct"] = round(
                100.0 * acct["useful_fwd_flops"] / (stream_ms / 1e3)
                / V5E_PEAK_BF16, 2,
            )
            # what the slab kernels actually execute per frame, and the
            # resulting effective rate — the overfetch_x gap between
            # walked and useful FLOPs is the kernel-level headroom
            out["slab_walked_gflop_per_frame"] = round(
                acct["walked_kernel_flops"] / 1e9, 1
            )
            out["slab_kernel_effective_tflops"] = round(
                acct["walked_kernel_flops"] / (stream_ms / 1e3) / 1e12, 1
            )
            out["slab_l1_overfetch_x"] = round(acct["l1_overfetch_x"], 2)
            out["slab_l0_overfetch_x"] = round(acct["l0_overfetch_x"], 2)
        except Exception as exc:
            out["mfu_error"] = repr(exc)[:200]
    if os.environ.get("POINTGNN_BENCH_TRAIN", "1") != "0":
        try:
            train_ms, mfu = bench_train_step(cfg)
            # edge-list step carries frames_per_device=2 frames
            out["train_step_edgelist_ms_per_frame"] = round(train_ms / 2, 2)
            if mfu is not None:
                out["train_edgelist_mfu_pct"] = round(mfu, 2)
        except Exception as exc:  # never sink the headline metric
            out["train_step_error"] = repr(exc)[:200]
        try:
            # production TPU training path: device-graph + slab VJP
            # kernels, one frame per device
            dev_ms, dev_mfu, dev_mfu_err = bench_train_step_device(cfg)
            out["train_step_device_ms_per_frame"] = round(dev_ms, 2)
            if dev_mfu is not None:
                out["train_device_mfu_pct"] = round(dev_mfu, 2)
            elif dev_mfu_err:
                out["train_device_mfu_error"] = dev_mfu_err
        except Exception as exc:
            out["train_device_step_error"] = repr(exc)[:200]
        try:
            # same path batched: frames_per_device=2 (the reference's
            # batch 4 over 2 GPUs), in-step graph-union weighting
            b_ms, b_mfu, _ = bench_train_step_device(
                cfg, frames_per_device=2
            )
            out["train_step_device_b2_ms_per_frame"] = round(b_ms / 2, 2)
            if b_mfu is not None:
                out["train_device_b2_mfu_pct"] = round(b_mfu, 2)
        except Exception as exc:
            out["train_device_b2_error"] = repr(exc)[:200]
    if os.environ.get("POINTGNN_BENCH_PEDCYL", "1") != "0":
        # The 6-class family's r=0.4 slab grid caps at 256^2 cells
        # (cell ~1.0m > radius -> up to ~6x candidate overfetch per
        # window); measure it rather than assume it's fine.
        try:
            out["ped_cyl_stream_ms"] = round(bench_ped_cyl(), 2)
        except Exception as exc:
            out["ped_cyl_error"] = repr(exc)[:200]
    print(json.dumps(out))


def bench_ped_cyl():
    """Streaming ms/frame for the Pedestrian_and_Cyclist model."""
    from pointgnn_tpu import configs
    from pointgnn_tpu.graph import device_builder as db
    from pointgnn_tpu.infer import InferencePipeline

    cfg = configs.model_config("Pedestrian_and_Cyclist", T=3)
    spec = db.spec_from_config(
        cfg, num_points=24576, num_keypoints=12288,
        per_center_caps=(32, 192),
    )
    pipe = InferencePipeline(
        cfg, on_device_graph=True, use_box_score=False, device_spec=spec
    )
    # point density (not object class mix) drives the radius-search
    # cost, so the car-scene synthetic frames are representative
    frames = [_bench_frame(i) for i in range(8)]
    n = 16
    stream_frames = [frames[i % len(frames)] for i in range(n)]
    for _ in pipe.stream(stream_frames[:4], raw=True):  # warm/compile
        pass
    t0 = time.perf_counter()
    for _ in pipe.stream(stream_frames, raw=True):
        pass
    return (time.perf_counter() - t0) / n * 1e3


if __name__ == "__main__":
    main()
