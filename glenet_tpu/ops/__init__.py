from . import iou3d, nms, scatter, voxelize
