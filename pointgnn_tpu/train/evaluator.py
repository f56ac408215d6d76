"""Continuous checkpoint evaluation (the reference's eval.py).

Polls a training directory, evaluates each new checkpoint over the eval
split with the same loss + streaming-metric set as training, and writes
scalars to a separate eval directory — behavioral parity with
/root/reference/eval.py:297-397 (``eval_once`` / ``eval_repeat``,
skip-already-evaluated, stop at ``max_step``).  The forward + loss +
metric counts run as one jitted device program per frame.
"""

import os
import time
from typing import Dict, Optional

import numpy as np

from pointgnn_tpu.graph import pad
from pointgnn_tpu.model import encodings
from pointgnn_tpu.model.pointgnn import get_model
from pointgnn_tpu.parallel import step as step_lib
from pointgnn_tpu.train import checkpoint as ckpt_lib
from pointgnn_tpu.train import metrics as metrics_lib
from pointgnn_tpu.train import summary
from pointgnn_tpu.train.pipeline import DataProvider, FetchSpec
from pointgnn_tpu.train.trainer import loss_config


class Evaluator:
    def __init__(
        self,
        config: Dict,
        eval_config: Dict,
        fetch_spec: FetchSpec,
        num_frames: int,
        capacity: Optional[pad.GraphCapacity] = None,
        train_config: Optional[Dict] = None,
    ):
        import jax

        self.config = config
        self.eval_config = eval_config
        self.num_frames = num_frames
        self.train_config = train_config or {}
        enc_len = encodings.get_encoding_len(config["box_encoding_method"])
        # Device-graph evaluation (the production TPU path): graph
        # construction + label assignment + box encoding run inside the
        # jitted eval step over the EXACT uncapped slab neighborhoods —
        # the same graphs a device_graph checkpoint trained on, so no
        # capacity sizing question exists at all.  "auto" follows the
        # checkpoint's frozen train_config.
        dg = eval_config.get("device_graph", "auto")
        if dg == "auto":
            dg = bool(self.train_config.get("device_graph", False))
        self.device_graph = bool(dg)
        self.device_spec = None
        self._graph_builder = None
        model_extra = {}
        if self.device_graph:
            from pointgnn_tpu.train import device_pipeline as dpipe

            # shared with Trainer.__init__ (resolve_device_setup) so an
            # evaluated checkpoint sees the same graphs it trained on;
            # frozen train_configs JSON-round-trip the spec into nested
            # lists, which resolve_device_setup coerces back
            dspec, model_extra = dpipe.resolve_device_setup(
                config,
                spec=(
                    eval_config.get("device_graph_spec")
                    or self.train_config.get("device_graph_spec")
                ),
                slab=eval_config.get(
                    "device_graph_slab",
                    self.train_config.get("device_graph_slab", "auto"),
                ),
            )
            self.device_spec = dspec
            fetch_spec = fetch_spec._replace(device_spec=dspec)
        self.model = get_model(config["model_name"])(
            num_classes=config["num_classes"],
            box_encoding_len=enc_len,
            mode="eval",
            **model_extra,
            **config["model_kwargs"],
        )
        if self.device_graph:
            from pointgnn_tpu.train import device_pipeline as dpipe

            self._graph_builder = dpipe.make_graph_builder(
                self.device_spec, self.model.output_graph_level, config
            )
        if capacity is None:
            from pointgnn_tpu import configs as cfg_mod

            capacity = cfg_mod.tpu_settings(config["label_method"])[
                "frame_capacity"
            ]
            if not self.device_graph and (
                self.train_config.get("device_graph")
                or eval_config.get("host_eval_of_device_checkpoint")
            ):
                # host-path fallback for a checkpoint trained on the
                # UNCAPPED slab neighborhoods: the training-capacity
                # edge bucket truncates dense clusters and mis-scores
                # it (BEV 0.00 vs 100 — docs/PERF_NOTES.md).  Size the
                # edge buckets for the uncapped density, like the
                # acceptance smoke does.
                capacity = pad.GraphCapacity(
                    vertices=capacity.vertices,
                    edges=tuple(4 * e for e in capacity.edges),
                )
        self.capacity = capacity
        loss_fn = step_lib.make_loss_fn(
            self.model, loss_config(config), with_logits=True
        )

        def metric_aux(params, graph):
            _, aux = loss_fn(params, graph)
            logits = aux.pop("logits")
            aux.update(
                metrics_lib.device_updates(
                    logits,
                    graph.cls_labels,
                    graph.vertex_mask[self.model.output_graph_level],
                    self.model.num_classes,
                )
            )
            return aux

        if self.device_graph:
            def eval_step(params, frame):
                # deterministic graph (no rnd key): the reference's
                # eval fetch does not randomize either (eval.py:68-117)
                return metric_aux(params, self._graph_builder(frame))
        else:
            eval_step = metric_aux
        self._eval_step = jax.jit(eval_step)
        # absorb the tunneled backend's one-time D2H channel setup here
        # (can cost minutes; same warm as Trainer/InferencePipeline)
        import jax.numpy as jnp

        jax.device_get(jnp.zeros(8, jnp.float32))
        self.metrics = metrics_lib.StreamingMetrics(
            config["num_classes"], enc_len
        )
        self.provider = DataProvider(
            fetch_spec._replace(is_eval=True),
            load_dataset_to_mem=False,
            num_workers=eval_config.get("num_load_dataset_workers", 0),
            num_frames=num_frames,
        )
        self._evaluated_steps = set()

    # ------------------------------------------------------------------
    def eval_once(self, train_dir: str, eval_dir: str, step: int) -> Dict:
        """Evaluate checkpoint ``model-<step>`` over the split
        (eval.py:297-375)."""
        import jax

        import collections

        import concurrent.futures

        state, _ = ckpt_lib.restore_checkpoint(train_dir, step=step)
        params = state["params"] if "params" in state else state
        params = jax.device_put(params)
        self.metrics.reset()
        t0 = time.time()

        def put_frame(frame_idx):
            """fetch -> pad (growing, never truncating) -> ONE H2D put.

            Runs on the single background thread: device_put from the
            dispatching thread serializes its ~33ms flat latency into
            every frame on tunneled backends, and puts from more than
            one thread degrade in-flight programs (docs/PERF_NOTES.md
            transfer study) — same pattern as infer.stream().
            """
            frame = self.provider.provide(frame_idx)
            if self.device_graph:
                # DeviceFrame: raw packed points + GT boxes (~0.2MB);
                # the graph is built inside the jitted eval step on the
                # exact uncapped neighborhoods — no capacity to manage
                return jax.device_put(frame)
            # grow instead of truncate: dropped edges under-aggregate
            # max features and silently mis-score checkpoints trained
            # on uncapped neighborhoods (the 0.00-BEV trap)
            self.capacity, grew = pad.grow_to_fit(self.capacity, [frame])
            if grew:
                print(
                    "eval capacity grown to %r (one-time recompile)"
                    % (self.capacity,)
                )
            return jax.device_put(
                pad.batch_and_pad([frame], self.capacity)
            )

        # pipeline both the H2D puts (ahead) and the aux fetch (behind):
        # a device_get right after dispatch stalls ~50ms on the tunneled
        # backend; draining a frame that finished several dispatches ago
        # is a pure transfer (docs/PERF_NOTES.md)
        pending = collections.deque()
        with concurrent.futures.ThreadPoolExecutor(1) as pool:
            puts = collections.deque(
                pool.submit(put_frame, i)
                for i in range(min(2, self.num_frames))
            )
            next_idx = len(puts)
            while puts:
                graph = puts.popleft().result()
                if next_idx < self.num_frames:
                    puts.append(pool.submit(put_frame, next_idx))
                    next_idx += 1
                pending.append(self._eval_step(params, graph))
                while len(pending) > 4:
                    self.metrics.update(
                        jax.device_get(pending.popleft())
                    )
        while pending:
            self.metrics.update(jax.device_get(pending.popleft()))
        elapsed = time.time() - t0
        self.frames_per_second = self.num_frames / max(elapsed, 1e-9)
        print(
            "eval throughput: %.1f frames/s (%d frames in %.1fs)"
            % (self.frames_per_second, self.num_frames, elapsed)
        )
        results = self.metrics.print_epoch(step, 0, 0.0, elapsed)
        for key, value in results.items():
            summary.write_summary_scale(key, value, step, eval_dir)
        self._evaluated_steps.add(step)
        return results

    def eval_repeat(
        self,
        train_dir: str,
        eval_dir: str,
        eval_every_second: float = 60,
        max_step: int = -1,
        max_polls: Optional[int] = None,
    ):
        """Poll train_dir for new checkpoints (eval.py:377-397)."""
        polls = 0
        while True:
            steps = ckpt_lib.list_checkpoint_steps(train_dir)
            fresh = [s for s in steps if s not in self._evaluated_steps]
            for step in fresh:
                print("Evaluating checkpoint at step %d" % step)
                self.eval_once(train_dir, eval_dir, step)
                if 0 < max_step <= step:
                    return
            polls += 1
            if max_polls is not None and polls >= max_polls:
                return
            time.sleep(eval_every_second)

    def close(self):
        self.provider.close()
