from radzero_tpu.data.processing import (
    AspectRatioImageProcessor,
    BitStyleImageProcessor,
    BlipStyleImageProcessor,
    M3AEImageProcessor,
    build_image_processor,
)
