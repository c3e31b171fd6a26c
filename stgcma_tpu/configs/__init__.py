from .model_configs import (
    SwinConfig,
    ClipConfig,
    AVSHeadConfig,
    AVQAHeadConfig,
    swin_base,
    swin_large,
    swin_tiny_test,
    clip_b16,
    clip_l14,
    clip_tiny_test,
)
