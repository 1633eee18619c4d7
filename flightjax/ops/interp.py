"""N-D multilinear interpolation on regular (rectilinear) grids.

The TPU-native replacement for the reference's Interpolations.jl linear
B-spline lookups (aero tables `c172.jl:162-196`, engine charts
`piston.jl:84-149`, propeller coefficient tables `propellers.jl:215-325`,
gain schedules `control.jl:950-994`, EGM96 geoid `geodesy.jl:161-211`).

Two extrapolation modes per axis, matching Interpolations.jl semantics:
- 'flat': clamp the query to the grid bounds (Flat())
- 'line': continue the edge-cell gradient linearly (Line())

A `Lookup` is a pytree (axes + values are leaves), so it can be captured in
jitted functions, vmapped over query points, and donated/sharded like any
other array. Evaluation is gather + FMA over the 2^d cell corners — XLA
fuses this; for large batched multi-table lookups see `flightjax.ops.pallas`.
"""

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class Lookup:
    """Multilinear interpolator over a rectilinear grid.

    axes: tuple of strictly increasing 1-D arrays (each length >= 2, or
          length 1 for a degenerate axis that is ignored).
    values: array whose first len(axes) dims match the axis lengths; any
          trailing dims are treated as vector-valued outputs.
    extrap: per-axis 'flat' | 'line' (or a single string for all axes).
    """

    def __init__(self, axes, values, extrap="flat"):
        self.axes = tuple(jnp.asarray(a) for a in axes)
        self.values = jnp.asarray(values)
        if isinstance(extrap, str):
            extrap = (extrap,) * len(self.axes)
        self.extrap = tuple(extrap)
        assert len(self.extrap) == len(self.axes)

    def tree_flatten(self):
        return (self.axes, self.values), (self.extrap,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        axes, values = children
        obj = cls.__new__(cls)
        obj.axes = tuple(axes)
        obj.values = values
        obj.extrap = aux[0]
        return obj

    def __call__(self, *coords):
        """Evaluate at query point(s). Each coord broadcasts; returns array of
        batch shape + trailing value dims."""
        assert len(coords) == len(self.axes)
        coords = jnp.broadcast_arrays(*[jnp.asarray(c) for c in coords])
        batch_shape = coords[0].shape

        idxs, wgts = [], []
        for x, ax, mode in zip(coords, self.axes, self.extrap):
            n = ax.shape[0]
            if n == 1:
                idxs.append(jnp.zeros(batch_shape, dtype=jnp.int32))
                wgts.append(jnp.zeros(batch_shape, dtype=self.values.dtype))
                continue
            i = jnp.clip(jnp.searchsorted(ax, x, side="right") - 1, 0, n - 2)
            x0 = jnp.take(ax, i)
            x1 = jnp.take(ax, i + 1)
            w = (x - x0) / (x1 - x0)
            if mode == "flat":
                w = jnp.clip(w, 0.0, 1.0)
            idxs.append(i.astype(jnp.int32))
            wgts.append(w.astype(self.values.dtype))

        d = len(self.axes)
        out = None
        for corner in range(1 << d):
            idx = []
            w = jnp.ones(batch_shape, dtype=self.values.dtype)
            for k in range(d):
                hi = (corner >> k) & 1
                n = self.axes[k].shape[0]
                if n == 1:
                    idx.append(idxs[k])
                    if hi:
                        w = None
                        break
                    continue
                idx.append(idxs[k] + hi)
                w = w * (wgts[k] if hi else (1.0 - wgts[k]))
            if w is None:
                continue
            v = self.values[tuple(idx)]
            v = v * w.reshape(batch_shape + (1,) * (v.ndim - len(batch_shape)))
            out = v if out is None else out + v
        return out


def uniform_axis(lo, hi, n):
    """Uniform grid axis (matches Julia `range(lo, hi, n)`)."""
    return jnp.asarray(np.linspace(lo, hi, n))
