from pointgnn_tpu.parallel.mesh import make_mesh, stack_graphs
from pointgnn_tpu.parallel.step import make_train_step, TrainState
