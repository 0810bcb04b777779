from .binary_ops import (  # noqa: F401
    attach_binary_metadata,
    decode_image_batch,
    extract_image_features,
    resize_images,
    sample_video_frames,
)
