"""Generic subsystem->Pallas-kernel wrapper.

`pallas_block(fn, example_args)` turns a pure batched function (pytrees of
arrays with leading batch dim B, plus unbatched scalars/tables) into a
single `pl.pallas_call` over a 1-D grid of lane blocks. Each input/output
LEAF becomes its own VMEM ref (no packing — refs of any rank are natural
in Mosaic; only reshape/concat-style reconstructions are not). Captured
constants (tables, constant vectors) are hoisted into explicit kernel
inputs via the traced jaxpr's consts, with Mosaic-safe transcendentals
(`flightjax.ops.mathx`) substituted during tracing.

Why: the flight-dynamics step is launch-latency-bound on TPU — O(100)
small XLA fusions over (4096,)-shaped arrays at ~2-6 us each. Wrapping a
whole subsystem (all of `Systems.f_ode`, the kinematics mechanization,
the Newton-Euler solve) into one kernel collapses its fusions into one
launch. The whole-step megakernel (`parallel/megakernel.py`) is the
maximal form; cluster kernels trade a few more launches for tractable
Mosaic compile times.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flightjax.ops.mathx import mosaic_safe


# optional (name, closed_jaxpr) callback set by tools/audit_mosaic.py to
# statically lint kernel bodies for Mosaic-unsupported ops without a
# round-trip through the remote compiler
AUDIT_HOOK = None


def _batched(leaf, batch):
    shape = jnp.shape(leaf)
    return len(shape) >= 1 and shape[0] == batch


def pallas_block(fn, example_args, batch, block=512, interpret=False,
                 name=None, vmem_limit_bytes=100 * 1024 * 1024):
    """Compile `fn(*example_args) -> out_pytree` as one Pallas kernel.

    Leaves whose leading dim == `batch` are blocked over a (batch//block,)
    grid; all other leaves (scalars, tables) are passed whole to every
    program. Returns a function with the same signature as `fn`."""
    assert batch % block == 0
    n_blocks = batch // block

    flat_in, in_tree = jax.tree.flatten(example_args)
    is_b = [_batched(l, batch) for l in flat_in]

    # trace on a block-sized view so the kernel body sees block shapes
    def blk_view(leaf, b):
        return jax.ShapeDtypeStruct(
            ((block,) + jnp.shape(leaf)[1:]) if b else jnp.shape(leaf),
            jnp.asarray(leaf).dtype)

    abstract = [blk_view(l, b) for l, b in zip(flat_in, is_b)]

    out_struct = {}

    def flat_fn(*flat):
        out = fn(*jax.tree.unflatten(in_tree, flat))
        leaves, tree = jax.tree.flatten(out)
        out_struct["tree"] = tree
        return tuple(leaves)

    from jax import core as jcore
    with mosaic_safe():
        closed = jax.make_jaxpr(flat_fn)(*abstract)
    if AUDIT_HOOK is not None:
        AUDIT_HOOK(name, closed)
    consts = closed.consts
    const_shaped = [jnp.reshape(jnp.asarray(c), (1, 1))
                    if jnp.ndim(c) == 0 else jnp.asarray(c) for c in consts]

    n_in, n_c = len(flat_in), len(consts)

    # bool leaves ride as int32 through the ref boundary (i1 vectors do not
    # load/store in Mosaic); the kernel casts at the edges
    in_bool = [jnp.asarray(l).dtype == jnp.bool_ for l in flat_in]
    out_bool = [a.dtype == jnp.bool_ for a in closed.out_avals]

    def kernel(*refs):
        ins = [r[:].astype(bool) if b else r[:]
               for r, b in zip(refs[:n_in], in_bool)]
        cvals = [r[0, 0] if jnp.ndim(c) == 0 else r[:]
                 for r, c in zip(refs[n_in:n_in + n_c], consts)]
        outs = jcore.eval_jaxpr(closed.jaxpr, cvals, *ins)
        for r, o, b in zip(refs[n_in + n_c:], outs, out_bool):
            r[:] = o.astype(jnp.int32) if b else o

    def spec_of(leaf, b):
        shape = jnp.shape(leaf)
        if b:
            blk = (block,) + shape[1:]
            nd = len(shape)
            return pl.BlockSpec(blk, (lambda n: lambda i: (i,) + (0,) * (n - 1))(nd),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, (lambda n: lambda i: (0,) * n)(len(shape)),
                            memory_space=pltpu.VMEM)

    in_specs = [spec_of(l, b) for l, b in zip(flat_in, is_b)]
    const_specs = [spec_of(c, False) for c in const_shaped]

    out_avals = closed.out_avals
    # every output is batched (block-shaped from the traced view); bool
    # outputs materialize as int32 buffers (cast back in `wrapped`)
    out_shapes = tuple(jax.ShapeDtypeStruct(
        (batch,) + a.shape[1:],
        jnp.int32 if a.dtype == jnp.bool_ else a.dtype) for a in out_avals)
    out_specs = [pl.BlockSpec(
        (block,) + a.shape[1:],
        (lambda n: lambda i: (i,) + (0,) * (n - 1))(len(a.shape)),
        memory_space=pltpu.VMEM) for a in out_avals]

    # the stage kernels' jaxpr bodies carry O(100) live intermediates; the
    # default 16 MiB scoped-vmem stack limit is too small at block>=1024
    # (measured 21.2 MiB for the kinematics+air stage and 72.1 MiB for the
    # Newton-Euler kernel at batch 4096 — rank-3 [block,3,3] intermediates
    # pad their minor dims to the (8,128) tile), while v5e has 128 MiB of
    # VMEM per core — raise the per-kernel cap instead of shrinking blocks
    # below the T(1024) 1-D layout tile.
    params = (None if interpret else
              pltpu.CompilerParams(
                  dimension_semantics=("parallel",),
                  vmem_limit_bytes=vmem_limit_bytes))
    call = pl.pallas_call(
        kernel, grid=(n_blocks,),
        in_specs=in_specs + const_specs,
        out_specs=out_specs, out_shape=out_shapes,
        interpret=interpret,
        **({} if params is None else {"compiler_params": params}),
    )

    def wrapped(*args):
        flat = [l.astype(jnp.int32) if b else l
                for l, b in zip(jax.tree.leaves(args), in_bool)]
        outs = call(*flat, *const_shaped)
        outs = outs if isinstance(outs, (tuple, list)) else (outs,)
        outs = [o.astype(bool) if b else o for o, b in zip(outs, out_bool)]
        return jax.tree.unflatten(out_struct["tree"], outs)

    return wrapped


# --------------------------------------------------------- batch-minor form

def to_minor(tree):
    """Move the leading batch axis of every rank>=2 leaf to the minor
    (last) position: [B, *tail] -> [*tail, B]. Rank-1 [B] leaves are
    already batch-minor."""
    return jax.tree.map(
        lambda l: jnp.moveaxis(l, 0, -1) if jnp.ndim(l) >= 2 else l, tree)


def to_major(tree):
    """Inverse of `to_minor`."""
    return jax.tree.map(
        lambda l: jnp.moveaxis(l, -1, 0) if jnp.ndim(l) >= 2 else l, tree)


def pallas_block_minor(lane_fn, example_args, batch, block=1024,
                       interpret=False, name=None,
                       vmem_limit_bytes=100 * 1024 * 1024):
    """`pallas_block` with the batch on the MINOR axis.

    Takes the UNBATCHED per-lane function and batch-LEADING example args
    (same examples the major form uses); returns a wrapped function whose
    runtime inputs/outputs are batch-MINOR ([*tail, B]). Inside the kernel
    the lanes ride the 128-wide lane dimension: a 3-vector temp is
    [3, block] (one (8,128)-tile row set, 37% occupancy) instead of
    [block, 3] (block/8 tiles at 2.3% occupancy). Measured on the
    Newton-Euler kernel this cuts scoped VMEM from 72 MiB to a few MiB and
    stops wasting ~40x of the VPU on tile padding."""
    assert batch % block == 0
    n_blocks = batch // block

    flat_in, in_tree = jax.tree.flatten(example_args)
    is_b = [_batched(l, batch) for l in flat_in]

    def blk_view(leaf, b):
        shape = jnp.shape(leaf)
        return jax.ShapeDtypeStruct(
            (shape[1:] + (block,)) if b else shape,
            jnp.asarray(leaf).dtype)

    abstract = [blk_view(l, b) for l, b in zip(flat_in, is_b)]
    axes_tree = jax.tree.unflatten(in_tree, [-1 if b else None for b in is_b])

    out_struct = {}

    def flat_fn(*flat):
        args = jax.tree.unflatten(in_tree, flat)
        out = jax.vmap(lane_fn, in_axes=axes_tree, out_axes=-1)(*args)
        leaves, tree = jax.tree.flatten(out)
        out_struct["tree"] = tree
        return tuple(leaves)

    from jax import core as jcore
    with mosaic_safe():
        closed = jax.make_jaxpr(flat_fn)(*abstract)
    if AUDIT_HOOK is not None:
        AUDIT_HOOK(name, closed)
    consts = closed.consts
    const_shaped = [jnp.reshape(jnp.asarray(c), (1, 1))
                    if jnp.ndim(c) == 0 else jnp.asarray(c) for c in consts]

    n_in, n_c = len(flat_in), len(consts)
    in_bool = [jnp.asarray(l).dtype == jnp.bool_ for l in flat_in]
    out_bool = [a.dtype == jnp.bool_ for a in closed.out_avals]

    def kernel(*refs):
        ins = [r[:].astype(bool) if b else r[:]
               for r, b in zip(refs[:n_in], in_bool)]
        cvals = [r[0, 0] if jnp.ndim(c) == 0 else r[:]
                 for r, c in zip(refs[n_in:n_in + n_c], consts)]
        outs = jcore.eval_jaxpr(closed.jaxpr, cvals, *ins)
        for r, o, b in zip(refs[n_in + n_c:], outs, out_bool):
            r[:] = o.astype(jnp.int32) if b else o

    def spec_of(leaf, b):
        shape = jnp.shape(leaf)
        if b:
            tail = shape[1:]
            blk = tail + (block,)
            nd = len(blk)
            return pl.BlockSpec(
                blk, (lambda n: lambda i: (0,) * (n - 1) + (i,))(nd),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, (lambda n: lambda i: (0,) * n)(len(shape)),
                            memory_space=pltpu.VMEM)

    in_specs = [spec_of(l, b) for l, b in zip(flat_in, is_b)]
    const_specs = [spec_of(c, False) for c in const_shaped]

    out_avals = closed.out_avals  # every output [*tail, block]
    out_shapes = tuple(jax.ShapeDtypeStruct(
        a.shape[:-1] + (batch,),
        jnp.int32 if a.dtype == jnp.bool_ else a.dtype) for a in out_avals)
    out_specs = [pl.BlockSpec(
        a.shape[:-1] + (block,),
        (lambda n: lambda i: (0,) * (n - 1) + (i,))(len(a.shape)),
        memory_space=pltpu.VMEM) for a in out_avals]

    params = (None if interpret else
              pltpu.CompilerParams(
                  dimension_semantics=("parallel",),
                  vmem_limit_bytes=vmem_limit_bytes))
    call = pl.pallas_call(
        kernel, grid=(n_blocks,),
        in_specs=in_specs + const_specs,
        out_specs=out_specs, out_shape=out_shapes,
        interpret=interpret,
        **({} if params is None else {"compiler_params": params}),
    )

    def wrapped(*args):
        flat = [l.astype(jnp.int32) if b else l
                for l, b in zip(jax.tree.leaves(args), in_bool)]
        outs = call(*flat, *const_shaped)
        outs = outs if isinstance(outs, (tuple, list)) else (outs,)
        outs = [o.astype(bool) if b else o for o, b in zip(outs, out_bool)]
        return jax.tree.unflatten(out_struct["tree"], outs)

    return wrapped
