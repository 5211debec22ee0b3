from . import checkpoint, densify, optimizer, trainer  # noqa: F401
