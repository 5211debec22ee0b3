from . import gaussians  # noqa: F401
