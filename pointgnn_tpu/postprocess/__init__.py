from pointgnn_tpu.postprocess.nms import (  # noqa: F401
    boxes_3d_to_corners,
    get_nms_fn,
    nms_boxes_3d,
    nms_boxes_3d_merge_only,
    nms_boxes_3d_score_only,
    nms_boxes_3d_uncertainty,
)
