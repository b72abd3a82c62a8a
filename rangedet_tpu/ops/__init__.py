from . import boxes, decode, rotated_iou, assigner, targets, nms  # noqa: F401
