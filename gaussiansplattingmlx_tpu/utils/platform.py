"""Platform selection helper.

The preinstalled axon TPU plugin ignores JAX_PLATFORMS, so CLI tools honour
GSPLAT_PLATFORM (e.g. "cpu") via jax.config before any computation.  Call
early in every entry point.
"""

import os


def apply_platform_env() -> None:
    platform = os.environ.get("GSPLAT_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
