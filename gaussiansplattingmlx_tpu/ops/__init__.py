from . import binning, losses, projection, rasterize_ref, ssim  # noqa: F401
