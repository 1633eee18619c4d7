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


def _group_key(dt):
    dt = np.dtype(dt)
    if dt == np.bool_:
        return "int32"
    if np.issubdtype(dt, np.integer):
        return "int32"
    return dt.name  # float32 / float64


def make_packer(state):
    """Build (spec, pack, unpack) for a batched pytree whose every leaf has
    leading batch dimension B."""
    leaves, treedef = jax.tree.flatten(state)
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
                    widths=tuple(widths[k] for k in keys), batch=batch)

    def pack(st):
        leaves = jax.tree.leaves(st)
        cols = [[] for _ in spec.keys]
        for leaf, g in zip(leaves, spec.groups):
            flat = jnp.reshape(leaf, (leaf.shape[0], -1))
            cols[g].append(flat.astype(jnp.dtype(spec.keys[g])))
        return tuple(jnp.concatenate(c, axis=1) for c in cols)

    def unpack(bufs):
        out = []
        for tail, dt, g, off, size in zip(spec.shapes, spec.dtypes,
                                          spec.groups, spec.offsets,
                                          spec.sizes):
            flat = jax.lax.slice_in_dim(bufs[g], off, off + size, axis=1)
            leaf = jnp.reshape(flat, (bufs[g].shape[0],) + tail)
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
