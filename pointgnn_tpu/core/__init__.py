from pointgnn_tpu.core.points import Points
from pointgnn_tpu.core import boxes
