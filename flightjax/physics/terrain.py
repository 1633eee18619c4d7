"""Terrain models.

Mirrors `/root/reference/lib/FlightPhysics/src/terrain.jl`: `TerrainData`
(orthometric elevation, inward NED surface normal, surface type —
`terrain.jl:13-19`) and the flat `HorizontalTerrain` with runtime-switchable
surface type (`:34-48`). Surface types are int32 codes so they live in the
carry and select friction coefficients branch-free.
"""

from typing import NamedTuple

import jax.numpy as jnp

from flightjax.core.modeling import Component

DRY_TARMAC = 0
WET_TARMAC = 1
ICY_TARMAC = 2


class TerrainData(NamedTuple):
    elevation: jnp.ndarray  # orthometric elevation (m)
    normal: jnp.ndarray     # (...,3) inward-pointing surface normal, NED
    surface: jnp.ndarray    # int32 surface code


class HorizontalTerrain(Component):
    """Flat terrain at constant orthometric elevation."""

    def __init__(self, elevation=0.0):
        self.elevation = float(elevation)

    def init_u(self):
        return {"surface": jnp.asarray(DRY_TARMAC, dtype=jnp.int32)}

    def terrain_data(self, u, n_e=None) -> TerrainData:
        surf = u["surface"] if u is not None else jnp.asarray(DRY_TARMAC, jnp.int32)
        return TerrainData(
            elevation=jnp.asarray(self.elevation),
            normal=jnp.asarray([0.0, 0.0, 1.0]),
            surface=surf)
