"""Convert GridMetrics (numpy) to a device-side dict of jnp arrays.

The dict is a plain pytree so it can be passed through jit / shard_map.
Also precomputes padded-aligned edge-factor arrays used by the a2b ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import NG
from .metrics import GridMetrics


def to_device(g: GridMetrics, dtype=jnp.float64) -> dict:
    n = g.npx - 1
    ng = g.ng
    jb = n + 1 + 2 * ng

    def pad_edge(e):  # (6, npx+1) 1-based -> (6, jb) aligned to B positions
        out = np.zeros((6, jb))
        for jf in range(1, g.npx + 1):
            out[:, jf - 1 + ng] = e[:, jf]
        return out

    d = {}
    for name in (
        "dx", "dy", "dxa", "dya", "dxc", "dyc", "area", "area_c",
        "rarea", "rarea_c", "rdx", "rdy", "rdxa", "rdya", "rdxc", "rdyc",
        "sin_sg", "cos_sg", "cosa_u", "sina_u", "rsin_u", "cosa_v", "sina_v",
        "rsin_v", "cosa_s", "rsin2", "cosa", "sina", "rsina",
        "divg_u", "divg_v", "del6_u", "del6_v", "fC", "f0",
        "a11", "a12", "a21", "a22", "vlon", "vlat", "ec1", "ec2",
        "en1", "en2",
        "corner_ext_coef",
    ):
        arr = getattr(g, name)
        d[name] = jnp.asarray(arr, dtype=dtype)
    d["edge_w"] = jnp.asarray(pad_edge(g.edge_w), dtype=dtype)
    d["edge_e"] = jnp.asarray(pad_edge(g.edge_e), dtype=dtype)
    d["edge_s"] = jnp.asarray(pad_edge(g.edge_s), dtype=dtype)
    d["edge_n"] = jnp.asarray(pad_edge(g.edge_n), dtype=dtype)
    d["da_min"] = float(g.da_min)
    d["da_max"] = float(g.da_max)
    d["da_min_c"] = float(g.da_min_c)
    d["da_max_c"] = float(g.da_max_c)
    return d
