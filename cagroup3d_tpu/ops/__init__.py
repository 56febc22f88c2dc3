from .pallas_conv import subm_conv_classes_mxu  # noqa: F401
