"""End-to-end inference pipeline: points -> detections -> KITTI text.

TPU-first restructuring of the reference inference driver
(/root/reference/run.py:60-433).  The whole network *and* the
per-(vertex, class) box decode run as one jitted device program over a
static-capacity padded graph; the host does file IO, graph
construction (C++ grid hash), the greedy box-merge NMS, the occlusion
rescoring, and KITTI-format output — the same host/device split the
data demands (NMS is a sequential, data-dependent loop).

Stage timings are accumulated in a ``time_dict`` with the reference's
bucket names (run.py:191-540).
"""

import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from pointgnn_tpu.core import boxes as box_ops
from pointgnn_tpu.core.points import Points
from pointgnn_tpu.graph import builder, pad
from pointgnn_tpu.model import encodings
from pointgnn_tpu.model.pointgnn import get_model
from pointgnn_tpu.postprocess import iou as iou_lib
from pointgnn_tpu.postprocess import nms as nms_lib
from pointgnn_tpu.data.labels import LABEL_METHODS

# class-id -> KITTI name, folding horizontal/vertical pairs
# (run.py:369-383)
ALL_CLASS_NAMES = {
    "yaw": [
        "Background", "Car", "Car", "Pedestrian", "Pedestrian",
        "Cyclist", "Cyclist", "DontCare",
    ],
    "Car": ["Background", "Car", "Car", "DontCare"],
    "Pedestrian_and_Cyclist": [
        "Background", "Pedestrian", "Pedestrian", "Cyclist", "Cyclist",
        "DontCare",
    ],
}

IMG_CLIP_W = 1242.0
IMG_CLIP_H = 375.0


def select_input_features(attr: np.ndarray, mode: str) -> np.ndarray:
    """Input-feature selection ('irgb'|'0rgb'|'0000'|'i000'|'rgb'|'i'|'0')
    (run.py:226-240, train.py:91-104).  ``attr`` is [N, 4] = intensity+rgb
    (or [N, 1] intensity-only for the 'i'/'0' modes)."""
    if mode == "irgb":
        return attr.astype(np.float32)
    if mode == "rgb":
        return attr[:, 1:4].astype(np.float32)
    if mode == "0rgb":
        return np.hstack(
            [np.zeros((attr.shape[0], 1), np.float32), attr[:, 1:4]]
        ).astype(np.float32)
    if mode == "0000":
        return np.zeros_like(attr[:, :4], dtype=np.float32)
    if mode == "i000":
        return np.hstack(
            [attr[:, [0]], np.zeros((attr.shape[0], 3), np.float32)]
        ).astype(np.float32)
    if mode == "i":
        return attr[:, [0]].astype(np.float32)
    if mode == "0":
        return np.zeros((attr.shape[0], 1), dtype=np.float32)
    raise ValueError("unknown input_features mode: %s" % mode)


def input_feature_dim(mode: str) -> int:
    return {"irgb": 4, "rgb": 3, "0rgb": 4, "0000": 4, "i000": 4,
            "i": 1, "0": 1}[mode]


def occlusion_score(box: np.ndarray, xyz: np.ndarray) -> float:
    """Projected-extent coverage product (run.py:87-99): how much of the
    box's three axis extents the inlier points span."""
    if xyz.shape[0] == 0:
        return 0.0
    normals, lower, upper = box_ops.boxes_to_normals(box[None, :])
    normals, lower, upper = normals[0], lower[0], upper[0]
    projected = xyz @ normals.T
    spans = projected.max(axis=0) - projected.min(axis=0)
    return float(np.prod(spans / (upper - lower)))


def detections_to_kitti_labels(
    label_method: str,
    class_labels: np.ndarray,
    boxes_3d: np.ndarray,
    scores: np.ndarray,
    calib: Dict,
    aux: Dict,
    use_box_score: bool = True,
) -> List[Tuple]:
    """Project NMS survivors to 2D, clip, truncation-filter, occlusion
    -rescore (run.py:360-421).  Returns KITTI label tuples.

    Module-level so the parity oracle can byte-compare this tail
    against a reference replay on identical NMS inputs;
    :meth:`InferencePipeline.detections_to_kitti` delegates here.
    ``aux`` carries ``hyp_xyz`` (all masked hypothesis coordinates —
    run.py:399 rescales against the FULL masked set, not per class).
    """
    from pointgnn_tpu.data.kitti import KittiDataset

    names = ALL_CLASS_NAMES[label_method]
    pred_labels: List[Tuple] = []
    if len(class_labels) == 0:
        return pred_labels
    corners = nms_lib.boxes_3d_to_corners(boxes_3d)
    for i in range(len(corners)):
        img_pts = KittiDataset.cam_points_to_image(
            Points(xyz=corners[i], attr=None), calib
        )
        xy = img_pts.xyz[:, :2]
        xmin, ymin = np.amin(xy, axis=0)
        xmax, ymax = np.amax(xy, axis=0)
        clip_xmin, clip_ymin = max(xmin, 0.0), max(ymin, 0.0)
        clip_xmax = min(xmax, IMG_CLIP_W)
        clip_ymax = min(ymax, IMG_CLIP_H)
        truncation_rate = 1.0 - (clip_ymax - clip_ymin) * (
            clip_xmax - clip_xmin
        ) / ((ymax - ymin) * (xmax - xmin))
        if truncation_rate > 0.4:
            continue
        x3d, y3d, z3d, l, h, w, yaw = boxes_3d[i]
        assert l > 0, str(i)
        score = scores[i]
        if use_box_score:
            inside = box_ops.points_in_box(aux["hyp_xyz"], boxes_3d[i])
            score = (
                1.0 + occlusion_score(boxes_3d[i], aux["hyp_xyz"][inside])
            ) * score
        pred_labels.append(
            (
                names[int(class_labels[i])], -1, -1, 0,
                clip_xmin, clip_ymin, clip_xmax, clip_ymax,
                h, w, l, x3d, y3d, z3d, yaw, score,
            )
        )
    return pred_labels


def format_kitti_lines(pred_labels: List[Tuple]) -> str:
    """Exact reference file bytes (run.py:425-433): every field
    ``str()``-ed with a trailing space, newline per label, one final
    blank line."""
    return (
        "".join(
            " ".join(str(v) for v in pred) + " \n" for pred in pred_labels
        )
        + "\n"
    )


class InferencePipeline:
    """Drives one config + parameter set over frames."""

    def __init__(
        self,
        config: Dict,
        params=None,
        checkpoint_dir: Optional[str] = None,
        capacity: Optional[pad.GraphCapacity] = None,
        use_box_merge: bool = True,
        use_box_score: bool = True,
        seed: int = 0,
        on_device_graph: bool = False,
        device_spec=None,
        edge_chunks: Optional[int] = None,
        compute_dtype="auto",
        max_hypotheses: int = 4096,
        pallas_tail="auto",
        slab="auto",
        slab_tuning: Optional[Dict] = None,
        auto_capacity: bool = True,
    ):
        import jax

        self.config = config
        self.max_hypotheses = max_hypotheses
        self.label_method = config["label_method"]
        self.num_classes = config["num_classes"]
        self.use_box_merge = use_box_merge
        self.use_box_score = use_box_score
        label_map, n_cls = LABEL_METHODS[self.label_method]
        assert n_cls == self.num_classes
        self.label_map = label_map
        # device decoder matched to the config's encoding (previously
        # hardwired to classaware semantics — silently wrong boxes for
        # canonical/direct/center/voxelnet configs)
        self.decode_jax = encodings.get_decode_jax(
            config["box_encoding_method"], label_map
        )
        self.enc_len = encodings.get_encoding_len(
            config["box_encoding_method"]
        )
        # on-device graph construction: per-frame host->device payload
        # shrinks from the ~20MB padded graph to the raw points
        self.on_device_graph = on_device_graph
        if on_device_graph:
            from pointgnn_tpu.graph import device_builder as db

            self.device_spec = device_spec or db.spec_from_config(config)
            if edge_chunks is None:
                edge_chunks = 8  # bound edge-MLP activations in HBM
        if compute_dtype == "auto":
            # bf16 MXU for the on-device path (box decode stays f32);
            # the host-graph path keeps f32 for bit-parity testing
            compute_dtype = "bfloat16" if on_device_graph else None
        # note: blocked-max aggregation (scatter-free reshape+reduce over
        # the [K, S] layout) measured slower than unsorted segment-max on
        # v5e, so the segment path is the default even for device-built
        # graphs.  Their "src"-sentinel pad slots carry valid
        # block-sorted destinations, so after _apply_sentinel's masking
        # the sorted segment reduction stays legal (nn/layers.py).
        blocked = None
        # the fold/slab/pallas fast paths require NONE normalization in
        # the point/edge MLPs (nn/layers guards raise otherwise); BN/IN
        # configs fall back to the general segment path automatically
        def _edge_norms_none():
            for lc in config["model_kwargs"]["layer_configs"][:-1]:
                kw = lc.get("kwargs", {})
                for key in ("point_MLP_normalization_type",
                            "edge_MLP_normalization_type"):
                    if key in kw and kw[key] != "NONE":
                        return False
            return True

        fast_ok = _edge_norms_none()
        if pallas_tail == "auto":
            # fused Pallas edge tail: a real win on TPU; on CPU it would
            # run in (slow) interpret mode, so auto only enables it for
            # device-built graphs on a TPU backend
            pallas_tail = (
                on_device_graph
                and jax.default_backend() == "tpu"
                and fast_ok
            )
        self.pallas_tail = bool(pallas_tail)
        if slab == "auto":
            # slab mode (fused radius search + edge MLP, no level-1
            # edge list): the production TPU path
            slab = self.pallas_tail and fast_ok
        # slab accepts True (both levels), "l1" (level-1 only, level-0
        # stays on the capped edge list), or False
        if not on_device_graph:
            slab = False
        self.slab = "l1" if slab == "l1" else bool(slab)
        slab_level1 = slab_level0 = None
        if on_device_graph:
            # two-way: also CLEAR pre-set flags (e.g. a slab-flagged
            # spec frozen into a device_graph checkpoint, coerced and
            # passed back in on a backend where slab resolves False) —
            # otherwise build_padded_graph would emit slab metadata plus
            # dummy 1-edge lists that a non-slab model aggregates as the
            # whole graph (same fix as resolve_device_setup)
            self.device_spec = self.device_spec._replace(
                slab_level1=bool(self.slab),
                slab_level0=bool(self.slab) and self.slab != "l1",
            )
        if self.slab:
            from pointgnn_tpu.graph.device_builder import (
                slab_kernel_wiring,
            )

            # optional kernel tuning ({"block_centers": .., "tile": ..},
            # or {"level0": {...}, "level1": {...}} for per-level values)
            # layered on the shared grid/radius/halo wiring so serving
            # cannot drift from the training-side derivation
            tuning = slab_tuning or {}
            t_l1 = tuning.get("level1", tuning)
            t_l0 = tuning.get("level0", tuning)
            pick = lambda t: {  # noqa: E731
                k: t[k]
                for k in ("block_centers", "tile", "sub", "zscan")
                if k in t
            }
            slab_level1 = {
                **slab_kernel_wiring(self.device_spec.level1),
                **pick(t_l1),
            }
            if self.device_spec.slab_level0:
                slab_level0 = {
                    **slab_kernel_wiring(self.device_spec.level0),
                    **pick(t_l0),
                }
        self.model = get_model(config["model_name"])(
            num_classes=self.num_classes,
            box_encoding_len=self.enc_len,
            mode="test",
            edge_chunks=edge_chunks,
            compute_dtype=compute_dtype,
            blocked_edges=blocked,
            edge_sentinel="src" if on_device_graph else "dst",
            pallas_tail=self.pallas_tail,
            slab_level1=slab_level1,
            slab_level0=slab_level0,
            **config["model_kwargs"],
        )
        self.input_features = config["input_features"]
        if capacity is None:
            from pointgnn_tpu import configs as cfg_mod

            capacity = cfg_mod.tpu_settings(self.label_method)[
                "runtime_capacity"
            ]
        self.capacity = capacity
        # grow the host-path capacity instead of truncating: edge
        # truncation silently mislocalizes checkpoints trained on
        # uncapped neighborhoods (slab / device_graph training) — the
        # 0.00-BEV trap in docs/PERF_NOTES.md.  Each growth recompiles
        # once (quantized buckets keep that to a handful per dataset).
        self.auto_capacity = auto_capacity

        if params is None:
            if checkpoint_dir is not None:
                from pointgnn_tpu.train import checkpoint as ckpt

                state, step = ckpt.restore_checkpoint(checkpoint_dir)
                assert state is not None, (
                    "no checkpoint found in %s" % checkpoint_dir
                )
                params = state["params"] if "params" in state else state
                self.restored_step = step
            else:
                params = self.model.init(
                    jax.random.PRNGKey(seed),
                    input_dim=input_feature_dim(self.input_features),
                )
                self.restored_step = 0
        self.params = params
        self.time_dict: Dict[str, float] = {}
        # cumulative capacity-truncation accounting (device path)
        self.overflow_counters: Dict[str, int] = {}
        self.frames_done = 0
        self._device_fn = jax.jit(self._build_device_fn())
        self._batch_fns: Dict[int, object] = {}  # stream() batch programs
        # The first device->host fetch of a process can pay a large
        # one-time channel-setup cost on tunneled TPU backends; absorb
        # it here so per-frame stage timings reflect steady state.
        import jax.numpy as jnp

        jax.device_get(jnp.zeros(8, jnp.float32))

    # ------------------------------------------------------------------
    def _build_device_fn(self):
        """forward -> softmax -> all-(vertex, class) box decode, fused on
        device (run.py:252-291 semantics, minus host round trips)."""
        import jax
        import jax.numpy as jnp

        model, num_classes = self.model, self.num_classes
        decode_jax = self.decode_jax

        def device_fn(params, graph):
            logits, box_enc = model.apply(params, graph)
            probs = model.postprocess(logits)
            k = probs.shape[0]
            cls_ids = jnp.tile(
                jnp.arange(num_classes, dtype=jnp.int32)[None, :], (k, 1)
            ).reshape(-1)
            xyz = jnp.repeat(
                graph.vertex_xyz[model.output_graph_level],
                num_classes,
                axis=0,
            )
            decoded = decode_jax(
                cls_ids, xyz, box_enc.reshape(-1, model.box_encoding_len)
            )
            return probs, decoded

        if not self.on_device_graph:
            return device_fn

        from pointgnn_tpu.graph import device_builder as db

        spec = self.device_spec
        max_hyp = self.max_hypotheses

        def device_fn_points(params, packed):
            """Fused: unpack -> graph build -> GNN -> softmax ->
            hypothesis mask -> top-k -> box decode.  One packed array in
            (~400KB; each put costs ~33ms flat on the tunneled backend),
            only the surviving hypotheses (~200KB) out."""
            points_xyz, features, mask = db.unpack_points(packed)
            graph = db.build_padded_graph(points_xyz, features, mask, spec)
            logits, box_enc = model.apply(params, graph)
            probs = model.postprocess(logits)
            out_level = model.output_graph_level
            kp_xyz = graph.vertex_xyz[out_level]
            kp_mask = graph.vertex_mask[out_level]
            k = probs.shape[0]
            flat_probs = probs.reshape(-1)
            cls_ids = jnp.tile(
                jnp.arange(num_classes, dtype=jnp.int32)[None, :], (k, 1)
            ).reshape(-1)
            valid = jnp.repeat(kp_mask.astype(bool), num_classes)
            fg = (cls_ids > 0) & (cls_ids < num_classes - 1)
            score = jnp.where(
                valid & fg & (flat_probs > 1.0 / num_classes),
                flat_probs,
                -1.0,
            )
            topv, topi = jax.lax.top_k(score, min(max_hyp, score.shape[0]))
            sel_cls = cls_ids[topi]
            sel_xyz = kp_xyz[topi // num_classes]
            sel_enc = box_enc.reshape(-1, model.box_encoding_len)[topi]
            decoded = decode_jax(sel_cls, sel_xyz, sel_enc)
            return topv, sel_cls, decoded, sel_xyz

        return device_fn_points

    # ------------------------------------------------------------------
    def _overflow_stats(self, points: Points) -> Dict[str, int]:
        """Host-computable capacity-overflow stats for one frame.

        Pure (no shared-state mutation, no warnings) so stream()'s
        background worker may call it off the main thread.
        """
        from pointgnn_tpu.graph import device_builder as db

        return db.host_overflow_stats(points.xyz, self.device_spec)

    def _apply_overflow_stats(self, stats: Dict[str, int], stacklevel=3):
        """Accumulate stats into ``overflow_counters`` and warn on
        keypoint drop.  MAIN THREAD ONLY: ``warnings`` filter contexts
        (catch_warnings/simplefilter) are not thread-safe, so callers'
        filters would intermittently miss an off-thread warning."""
        for key, val in stats.items():
            self.overflow_counters[key] = (
                self.overflow_counters.get(key, 0) + int(val)
            )
        if stats["keypoints_dropped"] > 0:
            import warnings

            warnings.warn(
                "keypoint overflow: %d occupied voxels > capacity %d;"
                " %d keypoints dropped (raise num_keypoints in the "
                "DeviceGraphSpec)"
                % (stats["voxels_occupied"],
                   self.device_spec.num_keypoints,
                   stats["keypoints_dropped"]),
                RuntimeWarning,
                stacklevel=stacklevel,
            )

    def _account_overflow(self, points: Points):
        """Stats + accumulate + warn for one frame — shared by
        run_frame and stream() so the batched serving path cannot lose
        keypoints silently."""
        # stacklevel=4: user -> run_frame -> here -> _apply_overflow
        # -> warnings.warn, so the warning points at the caller's line
        self._apply_overflow_stats(self._overflow_stats(points), stacklevel=4)

    def run_frame(
        self, points: Points, rng: Optional[np.random.Generator] = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict]:
        """One frame: returns ``(class_labels, boxes_3d, scores, aux)``.

        ``aux`` carries the masked hypothesis coordinates and original
        probabilities needed for occlusion rescoring.
        """
        import jax

        t0 = time.time()
        rng = rng or np.random.default_rng(0)
        if self.on_device_graph:
            from pointgnn_tpu.graph import device_builder as db

            # surface capacity truncation (pack_points warns on point
            # drop; occupied-voxel overflow is host-computable too) —
            # the reference's ragged feed never drops, so silent loss
            # would be a padded-design-only regression
            self._account_overflow(points)
            packed = db.pack_points(
                points.xyz,
                select_input_features(points.attr, self.input_features),
                self.device_spec.num_points,
            )
            t1 = time.time()
            self.time_dict["gen graph"] = (
                self.time_dict.get("gen graph", 0) + t1 - t0
            )
            scores, sel_cls, sel_boxes, sel_xyz = jax.device_get(
                self._device_fn(self.params, packed)
            )
            t2 = time.time()
            self.time_dict["gnn inference"] = (
                self.time_dict.get("gnn inference", 0) + t2 - t1
            )
            result = self._finish_frame(scores, sel_cls, sel_boxes, sel_xyz)
            t4 = time.time()
            self.time_dict["nms"] = self.time_dict.get("nms", 0) + t4 - t2
            return result
        else:
            gen_kwargs = self.config.get(
                "runtime_graph_gen_kwargs", self.config["graph_gen_kwargs"]
            )
            vcl, kil, el = builder.gen_multi_level_local_graph_v3(
                points.xyz, **gen_kwargs, rng=rng
            )
            features = select_input_features(
                points.attr, self.input_features
            )
            frame = pad.FrameData(features, vcl, kil, el)
            if self.auto_capacity:
                self.capacity, grew = pad.grow_to_fit(
                    self.capacity, [frame]
                )
                if grew:
                    import warnings

                    warnings.warn(
                        "graph exceeds the padded capacity; growing to "
                        "%r (one-time recompile) instead of truncating"
                        % (self.capacity,),
                        RuntimeWarning,
                        stacklevel=2,
                    )
            graph = pad.pad_frame(frame, self.capacity)
            t1 = time.time()
            self.time_dict["gen graph"] = (
                self.time_dict.get("gen graph", 0) + t1 - t0
            )
            probs, decoded = jax.device_get(
                self._device_fn(self.params, graph)
            )
            out_level = self.model.output_graph_level
            out_xyz = graph.vertex_xyz[out_level]
            vertex_valid = graph.vertex_mask[out_level].astype(bool)
        t2 = time.time()
        self.time_dict["gnn inference"] = (
            self.time_dict.get("gnn inference", 0) + t2 - t1
        )

        # host-side hypothesis masking (run.py:264-291)
        k = probs.shape[0]
        box_labels = np.tile(
            np.arange(self.num_classes)[None, :], (k, 1)
        ).reshape(-1)
        box_probs = probs.reshape(-1)
        hyp_xyz = np.repeat(out_xyz, self.num_classes, 0)
        hyp_valid = np.repeat(vertex_valid, self.num_classes)
        box_mask = (
            hyp_valid
            & (box_labels > 0)
            & (box_labels < self.num_classes - 1)
            & (box_probs > 1.0 / self.num_classes)
        )
        box_indices = np.flatnonzero(box_mask)
        t3 = time.time()
        self.time_dict["decode box"] = (
            self.time_dict.get("decode box", 0) + t3 - t2
        )
        aux = {
            "hyp_xyz": hyp_xyz[box_indices],
            "probs_ori": box_probs[box_indices],
        }
        if box_indices.size == 0:
            self.frames_done += 1  # empty frames count toward averages
            empty = np.zeros(0)
            return (
                empty.astype(np.int64),
                np.zeros((0, 7)),
                empty,
                aux,
            )
        sel_labels = box_labels[box_indices].copy()
        sel_probs = box_probs[box_indices]
        sel_boxes = decoded[box_indices]
        # fold vertical classes into horizontal (run.py:268-271)
        for v in range(2, self.num_classes - 1, 2):
            sel_labels[sel_labels == v] = v - 1

        nms_fn = nms_lib.get_nms_fn(self.use_box_merge, self.use_box_score)
        class_labels, boxes_3d, scores, _ = nms_fn(
            sel_labels,
            sel_boxes.astype(np.float64),
            sel_probs.astype(np.float64),
            overlapped_fn=iou_lib.overlapped_boxes_3d,
            overlapped_thres=self.config["nms_overlapped_thres"],
            appr_factor=100.0,
            top_k=-1,
        )
        t4 = time.time()
        self.time_dict["nms"] = self.time_dict.get("nms", 0) + t4 - t3
        self.frames_done += 1
        return class_labels, boxes_3d, scores, aux

    # ------------------------------------------------------------------
    def stream(
        self,
        frames,
        depth: int = 2,
        raw: bool = False,
        batch: int = 4,
        mesh=None,
    ):
        """Pipelined inference over an iterable of :class:`Points`.

        Yields ``(class_labels, boxes_3d, scores, aux)`` per frame in
        order (with ``raw=True``: the fetched device outputs, skipping
        the host NMS tail).  Requires ``on_device_graph``.

        Each host->device put on the tunneled backend pays ~33ms of
        flat latency regardless of payload size (docs/PERF_NOTES.md),
        so ``batch`` frames are packed into ONE put and the device
        program ``lax.map``s the per-frame pipeline over them,
        amortizing the put to ~33/batch ms/frame.  A background thread
        runs the packing + puts ``depth`` batches ahead so the
        remaining latency overlaps device compute.

        ``mesh`` (a 1-D ``jax.sharding.Mesh`` with axis ``"data"``)
        scales serving across chips: the batch axis is sharded over the
        mesh with ``shard_map`` — each device runs the fused per-frame
        program on its ``batch / mesh.size`` frames, with no
        cross-device communication (pure DP serving).
        """
        assert self.on_device_graph, "stream() needs on_device_graph"
        import collections
        import concurrent.futures

        import jax

        from pointgnn_tpu.graph import device_builder as db

        batch = max(1, int(batch))
        key = (batch, id(mesh) if mesh is not None else None)
        if key not in self._batch_fns:
            base = self._build_device_fn()

            def run_shard(params, stacked):
                return jax.lax.map(lambda p: base(params, p), stacked)

            if mesh is None:
                self._batch_fns[key] = jax.jit(run_shard)
            else:
                assert batch % mesh.size == 0, (
                    "batch %d must divide over the %d-device mesh"
                    % (batch, mesh.size)
                )
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                axis = mesh.axis_names[0]
                sharded = jax.shard_map(
                    run_shard,
                    mesh=mesh,
                    in_specs=(P(), P(axis)),
                    out_specs=P(axis),
                )
                self._batch_fns[key] = jax.jit(
                    sharded,
                    in_shardings=(
                        NamedSharding(mesh, P()),
                        NamedSharding(mesh, P(axis)),
                    ),
                )
        batch_fn = self._batch_fns[key]

        def put(frame_list):
            packed = np.stack(
                [
                    db.pack_points(
                        p.xyz,
                        select_input_features(p.attr, self.input_features),
                        self.device_spec.num_points,
                    )
                    for p in frame_list
                ]
            )
            if mesh is not None:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                return jax.device_put(
                    packed, NamedSharding(mesh, P(mesh.axis_names[0]))
                )
            return jax.device_put(packed)

        it = iter(frames)

        def next_group():
            group = []
            for p in it:
                group.append(p)
                if len(group) == batch:
                    break
            if not group:
                return None
            real = len(group)
            while len(group) < batch:  # pad the tail batch
                group.append(group[-1])
            return group, real

        def pull_and_put():
            # runs on the single background worker (order-preserving):
            # advancing the frame iterator (dataset IO), the overflow
            # stat computation, packing, and the device_put ALL overlap
            # the dispatch thread's compute — not just the put.  Stats
            # are only COMPUTED here; accumulation + the RuntimeWarning
            # happen on the main thread at dispatch (warnings filter
            # contexts are not thread-safe).
            nxt = next_group()
            if nxt is None:
                return None
            group, real = nxt
            stats = [self._overflow_stats(p) for p in group[:real]]
            return put(group), real, stats

        def drain(entry):
            outs, real = entry
            fetched = jax.device_get(outs)
            for i in range(real):
                row = tuple(np.asarray(a[i]) for a in fetched)
                yield row if raw else self._finish_frame(*row)
            if raw:  # non-raw frames are counted by _finish_frame
                self.frames_done += real

        pending = collections.deque()  # (dispatched program, real count)
        with concurrent.futures.ThreadPoolExecutor(1) as pool:
            puts = collections.deque()  # futures of (device put, real)
            for _ in range(depth + 1):
                puts.append(pool.submit(pull_and_put))
            while puts:
                res = puts.popleft().result()
                if res is not None:
                    packed, real, stats = res
                    for s in stats:  # main thread: warnings are
                        self._apply_overflow_stats(s)  # filterable
                    pending.append((batch_fn(self.params, packed), real))
                    puts.append(pool.submit(pull_and_put))
                while pending and (len(pending) > depth or not puts):
                    yield from drain(pending.popleft())

    def _finish_frame(self, scores, sel_cls, sel_boxes, sel_xyz):
        """Host tail shared by run_frame/stream: threshold, class fold,
        NMS (run.py:264-325 semantics)."""
        self.frames_done += 1  # count empty frames too (stage-time
        #                        averages divide by frames_done)
        keep = scores > 0
        sel_labels = sel_cls[keep].astype(np.int64)
        sel_probs = scores[keep].astype(np.float64)
        sel_boxes = sel_boxes[keep]
        aux = {"hyp_xyz": sel_xyz[keep], "probs_ori": sel_probs}
        if sel_labels.size == 0:
            return np.zeros(0, np.int64), np.zeros((0, 7)), np.zeros(0), aux
        for v in range(2, self.num_classes - 1, 2):
            sel_labels[sel_labels == v] = v - 1
        nms_fn = nms_lib.get_nms_fn(self.use_box_merge, self.use_box_score)
        class_labels, boxes_3d, out_scores, _ = nms_fn(
            sel_labels,
            sel_boxes.astype(np.float64),
            sel_probs,
            overlapped_fn=iou_lib.overlapped_boxes_3d,
            overlapped_thres=self.config["nms_overlapped_thres"],
            appr_factor=100.0,
            top_k=-1,
        )
        return class_labels, boxes_3d, out_scores, aux

    # ------------------------------------------------------------------
    def detections_to_kitti(
        self,
        class_labels: np.ndarray,
        boxes_3d: np.ndarray,
        scores: np.ndarray,
        calib: Dict,
        aux: Dict,
    ) -> List[Tuple]:
        """Project to 2D, clip, truncation-filter, occlusion-rescore
        (run.py:360-421). Returns KITTI label tuples."""
        return detections_to_kitti_labels(
            self.label_method, class_labels, boxes_3d, scores, calib,
            aux, use_box_score=self.use_box_score,
        )

    # ------------------------------------------------------------------
    def _write_kitti_txt(self, dataset, frame_idx, output_dir, pred_labels):
        filename = os.path.join(
            output_dir, "data", dataset.get_filename(frame_idx) + ".txt"
        )
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        with open(filename, "w") as f:
            f.write(format_kitti_lines(pred_labels))

    # ------------------------------------------------------------------
    def run_dataset(
        self,
        dataset,
        output_dir: str,
        num_frames: int = -1,
        is_test: bool = False,
        verbose: bool = True,
        visualization_level: int = 0,
    ) -> Dict[str, float]:
        """Full loop over a KittiDataset; writes ``<output_dir>/data/*.txt``
        (run.py:203-540).  Returns per-frame average stage times.
        ``visualization_level >= 1`` additionally writes detection
        overlays and BEV plots to ``<output_dir>/vis``.

        With on-device graphs the loop runs through :meth:`stream`
        (batched transfers, prefetch pipeline), so the device never
        waits on the host; the sequential path remains for host-built
        graphs and visual debugging."""
        n = dataset.num_files if num_frames < 0 else num_frames
        rng = np.random.default_rng(0)

        def fetch(frame_idx):
            start = time.time()
            points = dataset.get_cam_points_in_image_with_rgb(
                frame_idx, self.config.get("downsample_by_voxel_size")
            )
            calib = dataset.get_calib(frame_idx)
            self.time_dict["fetch input"] = (
                self.time_dict.get("fetch input", 0) + time.time() - start
            )
            return points, calib

        if self.on_device_graph and visualization_level == 0:
            calibs = []

            def frames_iter():
                for i in range(n):
                    points, calib = fetch(i)
                    calibs.append(calib)
                    yield points

            t_all = time.time()
            for frame_idx, (cls, boxes, scores, aux) in enumerate(
                self.stream(frames_iter())
            ):
                pred_labels = self.detections_to_kitti(
                    cls, boxes, scores, calibs[frame_idx], aux
                )
                self._write_kitti_txt(
                    dataset, frame_idx, output_dir, pred_labels
                )
            self.time_dict["total"] = (
                self.time_dict.get("total", 0) + time.time() - t_all
            )
            averages = {
                k: v / max(self.frames_done, 1)
                for k, v in self.time_dict.items()
            }
            if verbose:
                for k, v in averages.items():
                    print("%s: %.1f ms/frame" % (k, 1e3 * v))
            return averages

        for frame_idx in range(n):
            start = time.time()
            points, calib = fetch(frame_idx)
            cls, boxes, scores, aux = self.run_frame(points, rng)
            pred_labels = self.detections_to_kitti(
                cls, boxes, scores, calib, aux
            )
            self._write_kitti_txt(dataset, frame_idx, output_dir, pred_labels)
            if visualization_level >= 1:
                from pointgnn_tpu.utils import vis

                vis_dir = os.path.join(output_dir, "vis")
                os.makedirs(vis_dir, exist_ok=True)
                name = dataset.get_filename(frame_idx)
                vis.save_detection_image(
                    dataset.get_image(frame_idx), pred_labels, calib,
                    os.path.join(vis_dir, name + ".png"),
                )
                gt_boxes = None
                if not is_test:
                    from pointgnn_tpu.core import boxes as box_ops

                    gt_boxes = [
                        box_ops.label_to_box(l)
                        for l in dataset.get_label(frame_idx)
                        if l["name"] != "DontCare"
                    ]
                vis.plot_bev(
                    points.xyz, boxes, gt_boxes,
                    path=os.path.join(vis_dir, name + "_bev.png"),
                )
                if visualization_level >= 2:
                    # 3D view: interactive when Open3D is importable
                    # (reference run.py:151-189), else a saved render /
                    # BEV fallback
                    from pointgnn_tpu.utils import interactive

                    class_names = [
                        p[0] for p in pred_labels
                    ] if pred_labels else None
                    interactive.vis_detections(
                        points.xyz, boxes, names=class_names,
                        save_path=os.path.join(
                            vis_dir, name + "_3d.png"
                        ),
                    )
            self.time_dict["total"] = self.time_dict.get("total", 0) + (
                time.time() - start
            )
        averages = {
            k: v / max(self.frames_done, 1) for k, v in self.time_dict.items()
        }
        if verbose:
            for k, v in averages.items():
                print("%s: %.1f ms/frame" % (k, 1e3 * v))
        return averages
