from . import box_coder, box_utils, common, losses
