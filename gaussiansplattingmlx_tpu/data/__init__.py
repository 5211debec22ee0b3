from . import dataset, ply  # noqa: F401
