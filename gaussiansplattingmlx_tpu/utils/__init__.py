from . import camera, platform, point_cloud, profiler, sh, transforms  # noqa: F401
