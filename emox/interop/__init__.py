"""PyTorch checkpoint interop: SD VAE / UNet (2D->3D inflation) / wav2vec2."""

from emox.interop.torch_import import (
    import_vae,
    import_unet2d,
    import_wav2vec2,
    load_torch_state_dict,
    InflationReport,
)

__all__ = [
    "import_vae",
    "import_unet2d",
    "import_wav2vec2",
    "load_torch_state_dict",
    "InflationReport",
]
