from pointgnn_tpu.graph.builder import (
    gen_disjointed_rnn_local_graph_v3,
    gen_multi_level_local_graph_v3,
    get_graph_generate_fn,
)
from pointgnn_tpu.graph.pad import (
    FrameData,
    GraphCapacity,
    PaddedGraph,
    batch_and_pad,
    pad_frame,
)
