from .binary_ops import (  # noqa: F401
    attach_binary_metadata,
    decode_image_batch,
    extract_audio_features,
    extract_image_features,
    pack_video_frames,
    resize_images,
    sample_video_frames,
)
from .png_codec import decode_png, encode_png  # noqa: F401
from .wav_codec import decode_wav, encode_wav  # noqa: F401
