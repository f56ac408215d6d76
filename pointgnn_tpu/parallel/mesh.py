"""Device mesh and sharding helpers.

The reference's only parallelism is in-graph multi-tower data
parallelism with averaged gradients (/root/reference/train.py:174-262,
397-405; /root/reference/util/tf_util.py:3-43).  The TPU-native
equivalent: a 1-D ``jax.sharding.Mesh`` over the data axis, per-device
padded graphs (graph-union batching keeps each device's frames in one
disjoint graph), and ``psum``/``pmean`` collectives over ICI inside a
single jitted step (via ``shard_map``).
"""

from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointgnn_tpu.graph.pad import PaddedGraph

DATA_AXIS = "dp"


def make_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def stack_graphs(graphs: List[PaddedGraph]) -> PaddedGraph:
    """Stack per-device graphs along a new leading device axis."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack(xs, axis=0), *graphs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, stacked: PaddedGraph) -> PaddedGraph:
    """Device-put a stacked graph with its leading axis over the mesh."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), stacked
    )
