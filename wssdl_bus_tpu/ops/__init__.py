"""Detection geometry and kernels, all jit-traceable with static shapes."""

from wssdl_bus_tpu.ops.anchors import generate_anchors, shifted_anchors
from wssdl_bus_tpu.ops.boxes import (
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    iou_matrix,
    iou_ui_matrix,
)
from wssdl_bus_tpu.ops.nms import nms_mask, nms_indices
