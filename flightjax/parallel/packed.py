"""Packed-carry stepping: collapse a batched SimState pytree into a few
large buffers for `lax.scan`.

Why: a batched C172 SimState has ~50 small leaves ((B,), (B,3), (B,4), ...).
On TPU, every while-loop iteration pays per-buffer kernel/copy latency for
each carry leaf (~6 us each measured at B=4096 — an *empty* scan over the
unpacked carry costs ~290 us/iter, 37% of the whole physics step). Packing
the carry into one buffer per dtype (f32/i32, bools ride as i32) makes the
loop boundary 2-3 large arrays; the unpack slices fuse into the consumers
and the repack is a single concatenation per dtype.

The packing is purely a scan-boundary layout change: `unpack(pack(s)) == s`
leaf-exact (dtype, shape, value), so physics semantics and drift parity are
untouched.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PackSpec(NamedTuple):
    treedef: object
    shapes: tuple      # per-leaf trailing shapes (without batch dim)
    dtypes: tuple      # per-leaf original dtypes
    groups: tuple      # per-leaf group key index into `keys`
    offsets: tuple     # per-leaf start column within its group buffer
    sizes: tuple       # per-leaf flattened size
    keys: tuple        # group dtype names, e.g. ("float32", "int32")
    widths: tuple      # total columns per group
    batch: int
    paths: tuple = ()  # per-leaf key-path strings, e.g. "s/vehicle/geoid_N"

    def column_of(self, path_suffix):
        """(group index, column offset, size) of the unique leaf whose path
        ends with `path_suffix`."""
        hits = [i for i, p in enumerate(self.paths)
                if p.endswith(path_suffix)]
        assert len(hits) == 1, (path_suffix, hits)
        i = hits[0]
        return self.groups[i], self.offsets[i], self.sizes[i]


def _group_key(dt):
    dt = np.dtype(dt)
    if dt == np.bool_:
        return "int32"
    if np.issubdtype(dt, np.integer):
        return "int32"
    return dt.name  # float32 / float64


def make_packer(state, mosaic_safe=True):
    """Build (spec, pack, unpack) for a batched pytree whose every leaf has
    leading batch dimension B.

    `mosaic_safe=True` (default) flattens higher-rank tails with one-hot
    projections so pack/unpack can live inside a Pallas kernel body (Mosaic
    rejects minor-dim reshapes). For plain-XLA scan boundaries pass
    `mosaic_safe=False`: tails flatten with ordinary reshapes, which XLA
    fuses into the surrounding consumers for free."""
    def _kname(k):
        for a in ("key", "name", "idx"):
            if hasattr(k, a):
                return str(getattr(k, a))
        return str(k)

    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(state)
    paths = tuple("/".join(_kname(k) for k in kp)
                  for kp, _ in leaves_with_path)
    leaves = [leaf for _, leaf in leaves_with_path]
    batch = int(leaves[0].shape[0])
    shapes, dtypes, groups, offsets, sizes = [], [], [], [], []
    keys = []
    widths = {}
    for leaf in leaves:
        assert leaf.shape[0] == batch, "all leaves must share the batch dim"
        tail = tuple(int(d) for d in leaf.shape[1:])
        size = int(np.prod(tail, dtype=np.int64)) if tail else 1
        key = _group_key(leaf.dtype)
        if key not in keys:
            keys.append(key)
            widths[key] = 0
        shapes.append(tail)
        dtypes.append(str(leaf.dtype))
        groups.append(keys.index(key))
        offsets.append(widths[key])
        sizes.append(size)
        widths[key] += size
    spec = PackSpec(treedef=treedef, shapes=tuple(shapes),
                    dtypes=tuple(dtypes), groups=tuple(groups),
                    offsets=tuple(offsets), sizes=tuple(sizes),
                    keys=tuple(keys),
                    widths=tuple(widths[k] for k in keys), batch=batch,
                    paths=paths)

    def _flatten_tail(leaf):
        """(B, *tail) -> (B, prod(tail)) row-major WITHOUT any reshape or
        concatenate on the tail dims — Mosaic (the Pallas TPU compiler)
        rejects minor-dim shape casts, non-minor concatenates, and
        offset-mismatched concatenates, so higher-rank tails are projected
        out with constant one-hot masks and re-placed by broadcast-FMA."""
        if leaf.ndim <= 2:
            return leaf if leaf.ndim == 2 else leaf[:, None]
        if not mosaic_safe:
            return leaf.reshape(leaf.shape[0], -1)
        tail = leaf.shape[1:]
        size = int(np.prod(tail, dtype=np.int64))
        out = None
        for k in range(size):
            E = np.zeros(tail, dtype=np.float64)
            E.flat[k] = 1.0
            # rank-preserving reduction (keepdims) then minor squeezes:
            # a direct rank-3 -> rank-1 sum crashes Mosaic layout inference
            col = leaf * jnp.asarray(E, leaf.dtype)
            for ax in range(len(tail), 0, -1):
                col = jnp.sum(col, axis=ax, keepdims=True)
            for _ in range(len(tail) - 1):
                col = col[..., 0]
            # col: (B, 1)
            e_k = np.zeros((size,), dtype=np.float64)
            e_k[k] = 1.0
            term = col * jnp.asarray(e_k, leaf.dtype)
            out = term if out is None else out + term
        return out

    def _unflatten_tail(flat, tail):
        """(B, prod(tail)) -> (B, *tail), inverse of _flatten_tail: built as
        a sum of unit-column broadcasts against one-hot tail masks."""
        if len(tail) == 0:
            return flat[:, 0]
        if len(tail) == 1:
            return flat
        if not mosaic_safe:
            return flat.reshape(flat.shape[0], *tail)
        size = int(np.prod(tail, dtype=np.int64))
        out = None
        for k in range(size):
            E = np.zeros(tail, dtype=np.float64)
            E.flat[k] = 1.0
            col = flat[:, k:k + 1]           # (B, 1): no rank-1 values
            for _ in range(len(tail) - 1):
                col = col[..., None]         # unit appends -> (B, 1, ..., 1)
            term = col * jnp.asarray(E, flat.dtype)
            out = term if out is None else out + term
        return out

    def pack(st):
        leaves = jax.tree.leaves(st)
        cols = [[] for _ in spec.keys]
        for leaf, g in zip(leaves, spec.groups):
            flat = _flatten_tail(leaf)
            cols[g].append(flat.astype(jnp.dtype(spec.keys[g])))
        return tuple(jnp.concatenate(c, axis=1) for c in cols)

    def unpack(bufs):
        out = []
        for tail, dt, g, off, size in zip(spec.shapes, spec.dtypes,
                                          spec.groups, spec.offsets,
                                          spec.sizes):
            flat = jax.lax.slice_in_dim(bufs[g], off, off + size, axis=1)
            leaf = _unflatten_tail(flat, tail)
            out.append(leaf.astype(jnp.dtype(dt)))
        return jax.tree.unflatten(spec.treedef, out)

    return spec, pack, unpack


def packed_scan_step(step_fn, state):
    """Wrap a per-lane `step_fn(state) -> state` for packed scanning.

    Returns (bufs0, body) where `body(bufs) -> bufs` advances the whole
    batch one step with the packed carry; `unpack` recovers the pytree.
    """
    spec, pack, unpack = make_packer(state)
    bufs0 = pack(state)

    def body(bufs):
        st = unpack(bufs)
        st = jax.vmap(step_fn)(st)
        return pack(st)

    return bufs0, body, unpack
