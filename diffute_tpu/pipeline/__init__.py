from diffute_tpu.pipeline.regions import (  # noqa: F401
    process_location,
    generate_mask,
    make_masked_image,
)
from diffute_tpu.pipeline.crop import (  # noqa: F401
    infer_crop_params,
    train_crop,
    paste_back,
)
from diffute_tpu.pipeline.edit import DiffUTEPipeline, text_editing  # noqa: F401
