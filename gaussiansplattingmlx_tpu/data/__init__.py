from . import blender, colmap, dataset, nerfstudio, ply  # noqa: F401
