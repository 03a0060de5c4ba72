"""Host-side scene cache for tools/benchmarks.

Building the porsche-class scene costs minutes of host CPU (BC7 decode
of 11 full 2048^2 mip chains + atlas/page packing). The DeviceScene is
pure numpy before any `.device()` call, so tools pickle it once and
reload in seconds. Cache key is scene name; delete the cache dir after
changing asset decoding or scene composition. Opt out with
TPURAST_SCENE_CACHE=0 (tests never use this module).
"""

from __future__ import annotations

import logging
import os
import pickle

log = logging.getLogger("tpurast.tools")

CACHE_DIR = os.environ.get("TPURAST_SCENE_CACHE_DIR", "/root/repo/.scene_cache")

# Bump when DeviceScene gains fields the pickle must carry (stale
# pickles would silently fall back to dataclass defaults).
CACHE_VERSION = 2


def load_scene_cached(name: str, loader, *args, **kwargs):
    if os.environ.get("TPURAST_SCENE_CACHE", "1") != "1":
        return loader(*args, **kwargs)
    path = os.path.join(CACHE_DIR, f"{name}.v{CACHE_VERSION}.pkl")
    if os.path.exists(path):
        with open(path, "rb") as fh:
            return pickle.load(fh)
    scene = loader(*args, **kwargs)
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        # The scene must not carry device arrays (anything after
        # .device() memoizes jnp buffers onto the object).
        state = dict(scene.__dict__)
        state.pop("_device_cache", None)
        clone = type(scene).__new__(type(scene))
        clone.__dict__.update(state)
        pickle.dump(clone, fh, protocol=5)
    os.replace(tmp, path)
    return scene
