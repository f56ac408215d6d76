"""On-device training pipeline: host does IO + augmentation only.

The host-graph pipeline (train/pipeline.py) reproduces the reference's
``fetch_data`` — CPU graph construction, label assignment, and box
encoding per frame (reference train.py:78-133).  This module moves
everything after augmentation into the jitted train step:

    host:   load -> crop-paste aug -> augment -> pack points (+labels)
    device: voxel select -> radius graphs (or slab metadata) ->
            label assignment -> box encoding -> loss/grads

Per-frame host work drops from ~100ms of cKDTree/radius searches to
packing two small arrays, the per-step H2D payload shrinks to the raw
points (+ ~10KB of GT boxes), and with slab mode the step trains on the
EXACT uncapped radius graph — the runtime semantics — removing the
train/test neighbor-cap mismatch documented in docs/PERF_NOTES.md.
"""

from typing import NamedTuple, Optional

import numpy as np

from pointgnn_tpu.data.labels import LABEL_METHODS
from pointgnn_tpu.graph import device_builder as db
from pointgnn_tpu.graph import device_labels as dl


class DeviceFrame(NamedTuple):
    """One augmented frame, ready for the on-device train step."""

    packed_points: np.ndarray   # [P, 3 + C] (device_builder.pack_points)
    labels: dl.PackedLabels


def build_device_fetch(spec):
    """Host fetch closure for the device pipeline (FetchSpec with
    ``device_spec`` set).  Mirrors pipeline.build_fetch up to
    augmentation, then packs instead of building graphs."""
    from pointgnn_tpu.data import augment
    from pointgnn_tpu.infer import select_input_features

    dataset = spec.dataset.build()
    config, train_config = spec.config, spec.train_config
    dspec = spec.device_spec
    aug_fn = augment.get_data_aug(
        () if spec.is_eval else train_config.get("data_aug_configs", ())
    )
    sampler = None
    if not spec.is_eval and "crop_aug" in train_config:
        from pointgnn_tpu.data.crop_aug import CropAugSampler

        sampler = CropAugSampler(train_config["crop_aug"]["crop_filename"])
    label_map, num_classes = LABEL_METHODS[config["label_method"]]
    expend_factor = tuple(train_config.get("expend_factor", (1.0, 1.0, 1.0)))

    def fetch(frame_idx: int, seed: Optional[int] = None) -> DeviceFrame:
        rng = np.random.default_rng(seed)
        points = dataset.get_cam_points_in_image_with_rgb(
            frame_idx, config.get("downsample_by_voxel_size")
        )
        labels = dataset.get_label(frame_idx)
        if sampler is not None:
            points, labels = sampler.crop_aug(
                points,
                labels,
                sample_rate=train_config["crop_aug"]["sample_rate"],
                parser_kwargs=train_config["crop_aug"]["parser_kwargs"],
                rng=rng,
            )
        points, labels = aug_fn(points, labels, rng=rng)
        features = select_input_features(
            points.attr, config["input_features"]
        )
        packed = db.pack_points(points.xyz, features, dspec.num_points)
        plabels = dl.pack_frame_labels(
            labels, label_map, num_classes, expend_factor
        )
        return DeviceFrame(packed, plabels)

    return fetch


def make_graph_builder(dspec, out_level: int, config):
    """``graph_builder`` for parallel.step.make_train_step: one
    DeviceFrame -> labeled PaddedGraph, entirely on device.

    The returned ``build(frame, key=None)`` accepts an optional PRNG
    key that randomizes the keypoint selection per step (the on-device
    counterpart of the reference's ``add_rnd3d`` grid shift +
    random-point-per-voxel downsampling, graph_gen.py:20-26,134-150).
    The train step threads a key derived from the optimizer step when
    ``graph_rng_seed`` is set (parallel/step.py) — without it, every
    epoch trains on the SAME deterministic graph per frame and the
    model collapses under any other graph construction (measured: a
    device_graph-trained smoke checkpoint scores 100 AP through slab
    inference but 0 through the host edge-list path)."""
    label_map, _ = LABEL_METHODS[config["label_method"]]
    encode_fn = dl.get_encode_jax(
        config["box_encoding_method"], label_map
    )

    def build(frame: DeviceFrame, key=None):
        pxyz, feats, mask = db.unpack_points(frame.packed_points)
        graph = db.build_padded_graph(pxyz, feats, mask, dspec,
                                      rnd_key=key)
        kp_xyz = graph.vertex_xyz[out_level]
        kp_mask = graph.vertex_mask[out_level]
        cls, target, valid = dl.assign_labels_jax(
            kp_xyz, kp_mask, frame.labels
        )
        enc = encode_fn(cls, kp_xyz, target)
        return graph._replace(
            cls_labels=cls, encoded_boxes=enc, valid_boxes=valid
        )

    return build


def stack_frames(frames) -> DeviceFrame:
    """Stack DeviceFrames along a leading device axis for the mesh."""
    import jax

    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *frames
    )


def device_spec_for_training(config, tpu_settings: dict):
    """Training-time DeviceGraphSpec: graph kwargs from the TRAIN
    section (coarser voxels than runtime), capacities derived from the
    family's frame capacity."""
    cap = tpu_settings["frame_capacity"]
    return db.spec_from_config(
        config,
        num_points=cap.vertices[0],
        num_keypoints=cap.vertices[1],
        runtime=False,
    )


def coerce_device_spec(obj):
    """A DeviceGraphSpec from a config value.

    Frozen train_configs JSON-round-trip NamedTuples into nested lists
    (json has no tuple type); the continuous evaluator reads specs back
    from ``train_dir/train_config``, so both forms must load."""
    if obj is None or isinstance(obj, db.DeviceGraphSpec):
        return obj
    if isinstance(obj, (list, tuple)):
        p, k, voxel, l0, l1, *flags = obj
        return db.DeviceGraphSpec(
            int(p), int(k), float(voxel),
            db.LevelSpec(*l0), db.LevelSpec(*l1),
            *[bool(f) for f in flags],
        )
    raise TypeError(
        "device_graph_spec must be a DeviceGraphSpec or its JSON "
        "round-trip (nested lists), got %r" % (type(obj),)
    )


def resolve_device_setup(config, spec=None, slab="auto"):
    """``(dspec, model_extra)`` for device-graph training/eval/bench.

    The ONE place the spec is resolved and the model's slab wiring
    (grid/radius/halo per level, edge sentinel convention) is derived —
    trainer, evaluator, and bench share it so an evaluated checkpoint
    always sees the same graphs it trained on.

    ``spec``: explicit DeviceGraphSpec, its JSON round-trip, or None
    (the family's training spec).  ``slab`` "auto" enables the fused
    kernels on TPU backends.
    """
    import jax

    from pointgnn_tpu import configs as cfg_mod

    tpu = cfg_mod.tpu_settings(config["label_method"])
    dspec = coerce_device_spec(spec) or device_spec_for_training(
        config, tpu
    )
    if slab == "auto":
        slab = jax.default_backend() == "tpu"
    slab = bool(slab)
    # edges_sorted is NOT forced False here: for the "src" sentinel the
    # destinations of device-built graphs are always block-sorted, and
    # nn/layers._apply_sentinel legalizes indices_are_sorted=True after
    # masking the pad slots.
    model_extra = {"edge_sentinel": "src"}
    # The spec's slab flags follow the RESOLVED decision in BOTH
    # directions: a JSON-round-tripped spec can arrive with the flags
    # already set, and a slab-metadata graph (dummy 1-edge lists) driven
    # by a model without slab wiring silently aggregates garbage.
    dspec = dspec._replace(slab_level1=slab, slab_level0=slab)
    if slab:
        model_extra["slab_level1"] = db.slab_kernel_wiring(dspec.level1)
        model_extra["slab_level0"] = db.slab_kernel_wiring(dspec.level0)
    # tpu_settings' compute_dtype (default None = f32; measured NEUTRAL
    # for the slab train step — the kernels are DMA/fixed-cost-bound at
    # capped-graph density, docs/PERF_NOTES.md round 4).  An explicit
    # model_kwargs["compute_dtype"] in the config wins.
    cd = tpu.get("compute_dtype")
    if cd and "compute_dtype" not in config.get("model_kwargs", {}):
        model_extra["compute_dtype"] = cd
    return dspec, model_extra
