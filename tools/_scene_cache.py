"""Back-compat shim: the scene cache moved into the package
(tpurast/device/scene_cache.py) so the bench CLI shares it."""

from tpurast.device.scene_cache import (  # noqa: F401
    CACHE_DIR,
    CACHE_VERSION,
    load_scene_cached,
)
