"""Training driver: epoch loop, DP over a device mesh, streaming
metrics, summaries, checkpoint/resume.

Restructures the reference session loop (/root/reference/train.py:
500-650) TPU-first: frames are graph-union batched per device
(train.py:135-171), stacked over a 1-D data mesh, and one jitted SPMD
step computes loss + grads + metric counts with psum/pmean over ICI.
Epoch bookkeeping matches the reference: resume recomputes the epoch
from the restored step (train.py:512-519), metrics reset per epoch,
checkpoints (with frozen configs) every ``save_every_epoch`` epochs, at
``max_steps``, and at exit.
"""

import os
import time
from typing import Dict, Optional

import numpy as np

from pointgnn_tpu.graph import pad
from pointgnn_tpu.model import encodings
from pointgnn_tpu.model.pointgnn import get_model
from pointgnn_tpu.infer import input_feature_dim
from pointgnn_tpu.parallel import mesh as mesh_lib
from pointgnn_tpu.parallel import step as step_lib
from pointgnn_tpu.train import checkpoint as ckpt_lib
from pointgnn_tpu.train import metrics as metrics_lib
from pointgnn_tpu.train import optimizers as opt_lib
from pointgnn_tpu.train import summary
from pointgnn_tpu.train.pipeline import DataProvider, FetchSpec


def _all_norms_none(config: Dict) -> bool:
    """True when every MLP normalization in the layer configs is NONE
    (the slab/fold fast paths apply — all 7 shipped reference configs)."""
    for lc in config["model_kwargs"]["layer_configs"]:
        for key, val in lc.get("kwargs", {}).items():
            norm_key = (
                key == "normalization_type"
                or key.endswith("_normalization_type")
            )
            if norm_key and val != "NONE":
                return False
    return True


def loss_config(config: Dict) -> Dict:
    """Map the reference 'loss' config block onto model.loss kwargs."""
    loss = dict(config.get("loss", {}))
    out = {}
    for key in (
        "cls_loss_type", "cls_loss_kwargs", "loc_loss_type",
        "loc_loss_kwargs", "loc_loss_weight", "cls_loss_weight",
    ):
        if key in loss:
            out[key] = loss[key]
    return out


class Trainer:
    def __init__(
        self,
        config: Dict,
        train_config: Dict,
        fetch_spec: FetchSpec,
        num_frames: int,
        capacity: Optional[pad.GraphCapacity] = None,
        n_devices: Optional[int] = None,
        seed: int = 0,
    ):
        import jax

        self.config = config
        self.train_config = train_config
        self.num_frames = num_frames
        enc_len = encodings.get_encoding_len(config["box_encoding_method"])
        # On-device pipeline (train_config["device_graph"] = true):
        # graph construction + label assignment + box encoding move into
        # the jitted step (train/device_pipeline.py); with slab (auto on
        # TPU) the step trains on the exact uncapped radius graph via
        # the custom-VJP slab kernels — no edge lists at all.
        # device_graph routing: explicit train_config value wins; when
        # unset, NONE-normalization configs (all 7 shipped ones)
        # auto-route to the on-device pipeline — the host edge-list
        # path is a parity/debug path (~10x slower per frame on TPU,
        # BENCH_r03) and stays available with "device_graph": false.
        dg = train_config.get("device_graph")
        if dg is None:
            dg = _all_norms_none(config)
            if dg:
                print(
                    "device_graph training auto-enabled (NONE-"
                    "normalization config): graph construction + label "
                    "assignment + box encoding run inside the jitted "
                    "step; set \"device_graph\": false in the "
                    "train_config for the host edge-list path"
                )
        self.device_graph = bool(dg)
        self.device_spec = None
        self.graph_builder = None
        model_extra = {}
        if self.device_graph:
            from pointgnn_tpu.train import device_pipeline as dpipe

            dspec, model_extra = dpipe.resolve_device_setup(
                config,
                spec=train_config.get("device_graph_spec"),
                slab=train_config.get("device_graph_slab", "auto"),
            )
            self.device_spec = dspec
            # Freeze the RESOLVED setup into the train_config saved
            # beside every checkpoint: "auto" resolves from THIS
            # process's backend, so a continuous evaluator on a
            # different backend would otherwise re-resolve to different
            # graph semantics (capped edge lists vs exact uncapped
            # slab neighborhoods) than the model trained on.
            self.train_config = dict(train_config)
            # freeze the (possibly auto-)resolved routing too: the
            # continuous evaluator reads it from the saved train_config
            # and must see the same pipeline the checkpoint trained on
            self.train_config["device_graph"] = True
            self.train_config["device_graph_slab"] = bool(
                dspec.slab_level1
            )
            self.train_config["device_graph_spec"] = dspec
        self.model = get_model(config["model_name"])(
            num_classes=config["num_classes"],
            box_encoding_len=enc_len,
            mode="train",
            **model_extra,
            **config["model_kwargs"],
        )
        if self.device_graph:
            self.graph_builder = dpipe.make_graph_builder(
                self.device_spec, self.model.output_graph_level, config
            )
            fetch_spec = fetch_spec._replace(
                device_spec=self.device_spec
            )
        if capacity is None:
            from pointgnn_tpu import configs as cfg_mod

            capacity = cfg_mod.tpu_settings(config["label_method"])[
                "frame_capacity"
            ]
        self.capacity = capacity

        # devices: the reference's NUM_GPU x COPY_PER_GPU towers become
        # min(requested, available) mesh devices (train.py:174-182)
        requested = train_config.get("NUM_GPU", 1) * train_config.get(
            "COPY_PER_GPU", 1
        )
        if n_devices is None:
            n_devices = min(requested, len(jax.devices()))
        self.n_devices = max(n_devices, 1)
        self.mesh = (
            mesh_lib.make_mesh(self.n_devices) if self.n_devices > 1 else None
        )
        self.batch_size = train_config.get("batch_size", 1)
        assert self.batch_size % self.n_devices == 0, (
            "batch_size %d must divide over %d devices"
            % (self.batch_size, self.n_devices)
        )
        self.frames_per_device = self.batch_size // self.n_devices
        # device_graph batching: frames_per_device > 1 scans graph
        # build + loss over stacked frames inside the step with the
        # reference's graph-union endpoint weighting
        # (parallel/step.make_union_sums_fn) — so batch_size semantics
        # match the host-graph path (reference train.py:135-171).

        self.optimizer, self.lr_schedule = opt_lib.build_from_train_config(
            train_config
        )
        # per-step graph randomization for the device pipeline: the
        # on-device analog of the reference's add_rnd3d grid shift +
        # random-point-per-voxel at every fetch (graph_gen.py:20-26,
        # 134-150).  Without it every epoch trains on one frozen graph
        # per frame and the checkpoint only works through the identical
        # deterministic inference path (device_pipeline docstring).
        graph_rnd = self.device_graph and train_config.get(
            "device_graph_rnd3d",
            config["graph_gen_kwargs"].get("add_rnd3d", True),
        )
        self.step_fn = step_lib.make_train_step(
            self.model,
            self.optimizer,
            loss_config(config),
            mesh=self.mesh,
            unify_copies=train_config.get("unify_copies", True),
            num_levels=len(config["graph_gen_kwargs"]["level_configs"]),
            with_metrics=True,
            graph_builder=self.graph_builder,
            graph_rng_seed=seed if graph_rnd else None,
            bn_decay=train_config.get("bn_decay", 0.999),
            frames_per_device=(
                self.frames_per_device if self.device_graph else 1
            ),
        )
        params = self.model.init(
            jax.random.PRNGKey(seed),
            input_dim=input_feature_dim(config["input_features"]),
        )
        self.state = step_lib.init_train_state(params, self.optimizer)
        self.metrics = metrics_lib.StreamingMetrics(
            config["num_classes"], enc_len
        )
        self.provider = DataProvider(
            fetch_spec,
            load_dataset_to_mem=train_config.get("load_dataset_to_mem", True),
            load_dataset_every_N_time=train_config.get(
                "load_dataset_every_N_time", 1
            ),
            capacity=train_config.get("capacity", 1),
            num_workers=train_config.get("num_load_dataset_workers", 0),
            num_frames=num_frames,
            preload_list=list(range(num_frames))
            if train_config.get("load_dataset_to_mem", True)
            and train_config.get("num_load_dataset_workers", 0) > 0
            else (),
            seed=seed,
        )
        self.train_dir = train_config["train_dir"]
        self._rng = np.random.default_rng(seed)
        # absorb the tunneled backend's one-time D2H channel setup here
        # instead of inside the first step's metrics fetch
        import jax.numpy as jnp

        jax.device_get(jnp.zeros(8, jnp.float32))

    # ------------------------------------------------------------------
    @property
    def global_step(self) -> int:
        return int(np.asarray(self.state.step))

    def restore(self) -> int:
        """Resume from the latest checkpoint in train_dir
        (train.py:508-519)."""
        state, step = ckpt_lib.restore_checkpoint(
            self.train_dir, template=self.state
        )
        if state is not None:
            if self.mesh is not None:
                # orbax restores arrays COMMITTED to device 0; the SPMD
                # step then rejects the device-0 state against the
                # mesh-sharded batch.  Replicate over the mesh (the
                # same placement the init-path state reaches lazily).
                import jax
                from jax.sharding import NamedSharding, PartitionSpec

                state = jax.device_put(
                    state, NamedSharding(self.mesh, PartitionSpec())
                )
            self.state = state
            print("Restored checkpoint at step %d from %s" % (
                step, self.train_dir
            ))
        return step

    def save(self):
        ckpt_lib.save_checkpoint(
            self.train_dir,
            self.global_step,
            self.state,
            config=self.config,
            train_config=self.train_config,
        )

    # ------------------------------------------------------------------
    def _device_batch(self, frame_indices):
        frames = self.provider.provide_batch(frame_indices)
        if self.device_graph:
            if self.frames_per_device == 1:
                return frames[0]
            from pointgnn_tpu.train import device_pipeline as dpipe

            return dpipe.stack_frames(frames)  # leading [F] axis
        return pad.batch_and_pad(frames, self.capacity, self._rng)

    def prepare_batch(self, frame_indices):
        """Fetch + pack + DEVICE-PUT one step's input.

        Preparing inputs explicitly lets the train loop run the host
        work AND the H2D put on a prefetch thread so both overlap the
        previous step's compute — the same fix the serving path's
        ``stream()`` applies.  Measured (docs/PERF_NOTES.md round 4):
        the edge-list path serializes ~155 ms of host graph packing
        plus ~40 ms of in-dispatch put per step without this; the
        device-graph path ~2-3 ms of put."""
        import jax

        assert len(frame_indices) == self.batch_size
        per_dev = [
            self._device_batch(
                frame_indices[
                    d * self.frames_per_device:(d + 1) * self.frames_per_device
                ]
            )
            for d in range(self.n_devices)
        ]
        if self.mesh is not None:
            return mesh_lib.shard_batch(
                self.mesh, mesh_lib.stack_graphs(per_dev)
            )
        return jax.device_put(per_dev[0])

    def _prepare_deferred(self, frame_indices):
        """prepare_batch for the prefetch worker thread: capacity
        -overflow warnings are recorded (utils/thread_warnings) instead
        of raised — the warnings module's filter contexts are not
        thread-safe — and returned for the train loop to emit on the
        main thread when it consumes the batch."""
        from pointgnn_tpu.utils import thread_warnings

        with thread_warnings.deferred() as entries:
            prepared = self.prepare_batch(frame_indices)
        return prepared, entries

    def train_batch(self, frame_indices=None, prepared=None) -> Dict:
        """One optimizer step over batch_size frames."""
        if prepared is None:
            prepared = self.prepare_batch(frame_indices)
        self.state, aux = self.step_fn(self.state, prepared)
        return aux

    def train(
        self,
        max_epoch: Optional[int] = None,
        max_steps: Optional[int] = None,
        log_fn=None,
    ):
        """Full training run (train.py:519-650).

        Steps are PIPELINED: the loop enqueues up to
        ``train_config["aux_pipeline_depth"]`` (default 4) steps before
        fetching the oldest step's aux from the device.  On the
        tunneled TPU backend a per-step device_get stalls ~50ms — 1.6x
        the 32ms step itself (docs/PERF_NOTES.md) — while draining a
        step that finished several dispatches ago is a pure transfer.
        Metrics see every step's aux (just late); the NaN guard
        (reference models.py:305-306 asserts in-graph) fires at most
        ``depth`` steps after the event, which is equivalent — a NaN
        loss poisons the params, so every later loss is NaN too.  Set
        depth 0 for strict step-synchronous behavior.
        """
        import collections

        import jax

        max_epoch = max_epoch or self.train_config.get("max_epoch", 1)
        max_steps = (
            max_steps
            if max_steps is not None
            else self.train_config.get("max_steps", -1)
        )
        depth = int(self.train_config.get("aux_pipeline_depth", 4))
        # optional jax.profiler trace of a few steady-state steps
        # (SURVEY §5; the reference only had wall-clock stage timers)
        profile_dir = self.train_config.get("profile_dir")
        profile_start = self.train_config.get("profile_start_step", 10)
        profile_steps = self.train_config.get("profile_steps", 5)
        profiling = False
        # host-side step counter: reading self.state.step would
        # synchronize on the NEWEST enqueued step and re-serialize the
        # pipeline this loop exists to avoid
        step_no = self.global_step
        # exact epoch recovery: the batch loop below drops the tail
        # when batch_size does not divide num_frames, so an epoch is
        # floor(num_frames / batch_size) steps — the reference's
        # (step * batch_size) // num_frames (train.py:513-514)
        # undercounts in that case and re-trains finished epochs
        steps_per_epoch = self.num_frames // self.batch_size
        if steps_per_epoch == 0:
            # the batch loop below would run ZERO steps per epoch; with
            # a clamped steps_per_epoch=1 a resumed step_no > 0 (e.g.
            # num_frames shrank across runs) silently maps every past
            # step to a whole epoch and can skip all remaining training
            raise ValueError(
                "num_frames=%d < batch_size=%d: an epoch would contain "
                "no batches (shrink batch_size or add frames)"
                % (self.num_frames, self.batch_size)
            )
        start_epoch = step_no // steps_per_epoch
        pending = collections.deque()  # (step_no, device aux)

        def _consume(entry):
            done_step, aux = entry
            host_aux = jax.device_get(aux)
            total = float(np.asarray(host_aux["total_loss"]))
            if not np.isfinite(total):
                raise FloatingPointError(
                    "non-finite total loss %r at step %d"
                    % (total, done_step)
                )
            self.metrics.update(host_aux)

        from concurrent.futures import ThreadPoolExecutor

        # input prefetch: fetch + pack + device_put the NEXT batch on a
        # worker thread while the current step runs — otherwise the
        # host pack (+~155 ms/step on the edge-list path) and the H2D
        # put (~40 ms edge-list / ~2-3 ms device-graph) serialize into
        # every step (docs/PERF_NOTES.md round 4).  One worker keeps
        # provider/rng access sequential (deterministic batch contents).
        input_executor = ThreadPoolExecutor(max_workers=1)
        try:
            self._train_epochs(
                input_executor, start_epoch, max_epoch, max_steps,
                depth, step_no, pending, _consume, log_fn,
                profile_dir, profile_start, profile_steps, profiling,
            )
        finally:
            # wait=True: an in-flight prepare_batch finishes in bounded
            # time, and joining it keeps provider/_rng access strictly
            # sequential if the caller starts another train() right
            # after (wait=False would let the old worker race it)
            input_executor.shutdown(wait=True, cancel_futures=True)

    def _train_epochs(
        self, input_executor, start_epoch, max_epoch, max_steps,
        depth, step_no, pending, _consume, log_fn,
        profile_dir, profile_start, profile_steps, profiling,
    ):
        import jax

        for epoch_idx in range(start_epoch, max_epoch):
            self.metrics.reset()
            epoch_start = time.time()
            order = self._rng.permutation(self.num_frames)
            starts = list(range(
                0, self.num_frames - self.batch_size + 1, self.batch_size
            ))
            next_input = None
            for pos, batch_idx in enumerate(starts):
                if profile_dir and not profiling and (
                    step_no >= profile_start
                ):
                    jax.profiler.start_trace(profile_dir)
                    profiling = True
                if next_input is not None:
                    prepared, deferred_warns = next_input.result()
                    # main thread: overflow warnings recorded by the
                    # prefetch worker fire here, where callers' filters
                    # (catch_warnings/-W) behave deterministically
                    from pointgnn_tpu.utils import thread_warnings

                    thread_warnings.emit(deferred_warns)
                else:
                    prepared = self.prepare_batch(
                        order[batch_idx:batch_idx + self.batch_size]
                    )
                if pos + 1 < len(starts):
                    nxt = starts[pos + 1]
                    next_input = input_executor.submit(
                        self._prepare_deferred,
                        order[nxt:nxt + self.batch_size],
                    )
                else:
                    next_input = None
                aux = self.train_batch(prepared=prepared)
                step_no += 1
                pending.append((step_no, aux))
                while len(pending) > depth:
                    _consume(pending.popleft())
                if profiling and step_no >= (
                    profile_start + profile_steps
                ):
                    jax.profiler.stop_trace()
                    profiling = False
                    profile_dir = None  # one trace per run
                if 0 < max_steps <= step_no:
                    while pending:
                        _consume(pending.popleft())
                    if profiling:
                        jax.profiler.stop_trace()
                        profiling = False
                    print("save checkpoint at step %d to %s"
                          % (step_no, self.train_dir))
                    self.save()
                    return
            while pending:  # epoch metrics need every step's aux
                _consume(pending.popleft())
            lr = float(self.lr_schedule(self.global_step))
            results = self.metrics.print_epoch(
                self.global_step, epoch_idx, lr, time.time() - epoch_start
            )
            for key, value in results.items():
                summary.write_summary_scale(
                    key, value, self.global_step, self.train_dir
                )
            summary.write_summary_scale(
                "learning rate", lr, self.global_step, self.train_dir
            )
            if log_fn is not None:
                log_fn(epoch_idx, self.global_step, results)
            if (epoch_idx + 1) % self.train_config.get(
                "save_every_epoch", 20
            ) == 0:
                print("save checkpoint at epoch %d to %s"
                      % (epoch_idx, self.train_dir))
                self.save()
        if profiling:
            jax.profiler.stop_trace()
        self.save()

    def close(self):
        self.provider.close()
