from diffute_tpu.io.dataset import (  # noqa: F401
    UNetManifestDataset,
    VAEManifestDataset,
    SyntheticSceneDataset,
    make_unet_batch,
    make_vae_batch,
)
from diffute_tpu.io.storage import open_blob, read_image  # noqa: F401
