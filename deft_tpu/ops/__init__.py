from deft_tpu.ops import affine, decode, gaussian, iou, sampling  # noqa: F401
