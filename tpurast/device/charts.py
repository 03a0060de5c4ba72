"""UV charts: connected components of mesh faces under shared vertices.

glTF meshes duplicate vertices along UV seams (a vertex index carries ONE
uv), so two faces sharing a vertex INDEX are UV-continuous: the vertex-
sharing graph's connected components are exactly the mesh's UV charts
(atlas islands). Within a chart the surface->texture mapping is
continuous, which is the property the windowed sampler's tile planning
needs: a framebuffer tile's pixels FROM ONE CHART at one mip level have
a compact texel footprint (~tile-sized — mip selection keeps texel:pixel
~1:1), even when the texture's atlas scatters charts far apart. Planning
windows per (chart, mip) instead of per (texture, mip) is what makes
fragmented-UV meshes (e.g. stanford_dragon bound to a 2048^2 texture)
windowable instead of falling back to per-pixel gathers.

Status: the windowed sampler's page-coordinate covering
(kernels/sampler.py + device/pages.py) subsumed chart-keyed planning —
one page coordinate system already gives every (texture, mip) rect a
compact anchor range, so charts are NOT computed at scene build or
uploaded to the device. This module stays host-side for UV-layout
analysis tooling (tools/residual_analysis.py).
"""

from __future__ import annotations

import numpy as np


def face_charts(faces: np.ndarray, n_faces: int, n_vertices: int) -> np.ndarray:
    """Per-face chart id (dense, 0..n_charts-1): connected components of
    the vertex-sharing graph. `faces` is (Fp, 3) global vertex indices;
    only the first `n_faces` rows are real (padding gets chart 0).
    """
    if n_faces == 0:
        return np.zeros(faces.shape[0], dtype=np.int32)
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    f = np.asarray(faces[:n_faces], dtype=np.int64)
    # Two edges per face (v0-v1, v1-v2) connect all three corners.
    rows = np.concatenate([f[:, 0], f[:, 1]])
    cols = np.concatenate([f[:, 1], f[:, 2]])
    g = coo_matrix(
        (np.ones(rows.shape[0], np.int8), (rows, cols)),
        shape=(n_vertices, n_vertices),
    )
    _, vert_label = connected_components(g, directed=False)
    roots = vert_label[f[:, 0]]
    _, dense = np.unique(roots, return_inverse=True)
    out = np.zeros(faces.shape[0], dtype=np.int32)
    out[:n_faces] = dense.astype(np.int32)
    return out
