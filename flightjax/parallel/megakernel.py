"""Whole-step Pallas megakernel: the entire hybrid simulation step as ONE
TPU kernel over the fleet batch.

Why: the C172 step lowers to O(100) small XLA fusions over (batch,)-shaped
arrays; at batch 4096 each kernel moves ~16-64 KB, so the step is bound by
serialized kernel-launch latency (~650 us/step measured on TPU v5e), not by
compute (~1 MFLOP/step). Running the step *inside a single `pl.pallas_call`*
turns those ~100 launches into one: each grid program loads a lane-block of
the packed state into VMEM, evaluates the full step (RK4 x4 + f_step +
masked f_periodic) with the vector unit, and writes the block back.

Requirements (all satisfied by the flagship C172 models):
- every table lookup uses the dense (gather-free) hat-weight path of
  `flightjax.ops.interp.Lookup` — gathers do not lower to Mosaic;
- the EGM96 geoid rowgather is hoisted OUT of the kernel: the vehicle is
  stepped with `geoid_in_step=False` and the undulation is refreshed by a
  column-targeted XLA update between kernel invocations (identical
  semantics — the refresh still happens exactly once per step, see
  `aircraftbase.Vehicle.f_step`).

The kernel body is the UNMODIFIED `Simulation.step` vmapped over the lane
block — Pallas traces the same JAX code the plain path runs, so there is no
second implementation of the physics to keep in sync. Model tables and
constant vectors captured by the step close over the trace; they are
hoisted into explicit kernel inputs with `jax.closure_convert` (whole
arrays in VMEM, broadcast to every grid program).
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flightjax.parallel.packed import make_packer


def find_vehicle(system):
    """Locate the Vehicle inside a SimpleWorld/Aircraft composite."""
    obj = getattr(system, "aircraft", system)
    return getattr(obj, "vehicle", None)


def make_megakernel_step(sim, state, ctx=(), block=512, interpret=False):
    """Build `step(bufs) -> bufs` where the whole `sim.step` for a batch of
    lanes runs as one Pallas kernel (plus the external geoid refresh).

    `state` is a batched SimState (every leaf has leading dim B, B % block
    == 0). Returns (bufs0, step_packed, unpack)."""
    spec, pack, unpack = make_packer(state)
    B = spec.batch
    assert B % block == 0, (B, block)
    n_blocks = B // block

    vehicle = find_vehicle(sim.system)

    # inside the kernel, run RK4 as a fori_loop so the f_ode body appears
    # once in the jaxpr (bit-identical; ~4x fewer ops for Mosaic to compile)
    import copy
    from flightjax.core.sim import (rk4_incr, rk4_loop_incr, rk4_step,
                                    rk4_step_loop)
    sim = copy.copy(sim)
    if sim._integ is rk4_step:
        sim._integ = rk4_step_loop
    # compensated states (SimState.c attached) take the _integ_incr path —
    # swap it too or the kernel would inline f_ode 4x again
    if sim._integ_incr is rk4_incr:
        sim._integ_incr = rk4_loop_incr

    # block-shaped template and its packer (same column layout, fewer rows)
    state_blk = jax.tree.map(lambda l: l[:block], state)
    _, pack_blk, unpack_blk = make_packer(state_blk)
    bufs_blk = pack_blk(state_blk)

    def flat_step(*bufs):
        from flightjax.physics.aircraftbase import geoid_deferred
        st = unpack_blk(tuple(bufs))
        with geoid_deferred():
            st2 = jax.vmap(lambda s: sim.step(s, ctx))(st)
        return tuple(pack_blk(st2))

    # hoist every captured constant (tables, axes, constant vectors) into
    # explicit kernel arguments: trace the step to a jaxpr, take its consts,
    # and re-evaluate the jaxpr inside the kernel with the consts read from
    # refs. Scalars become (1, 1) so they can live in VMEM.
    from jax import core as jcore

    from flightjax.ops.mathx import mosaic_safe

    with mosaic_safe():  # swap atan/atan2/asin/acos for Mosaic-safe forms
        closed_jaxpr = jax.make_jaxpr(flat_step)(
            *(jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bufs_blk))
    consts = closed_jaxpr.consts
    const_shaped = [jnp.reshape(jnp.asarray(c), (1, 1))
                    if jnp.ndim(c) == 0 else jnp.asarray(c) for c in consts]

    n_bufs = len(bufs_blk)
    n_consts = len(consts)

    def kernel(*refs):
        in_refs = refs[:n_bufs]
        const_refs = refs[n_bufs:n_bufs + n_consts]
        out_refs = refs[n_bufs + n_consts:]
        cvals = [r[0, 0] if jnp.ndim(c) == 0 else r[:]
                 for r, c in zip(const_refs, consts)]
        outs = jcore.eval_jaxpr(closed_jaxpr.jaxpr, cvals,
                                *(r[:] for r in in_refs))
        for r, o in zip(out_refs, outs):
            r[:] = o

    bufs0 = pack(state)
    buf_specs = [pl.BlockSpec((block, b.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for b in bufs0]
    const_specs = [
        pl.BlockSpec(c.shape, (lambda nd: lambda i: (0,) * nd)(c.ndim),
                     memory_space=pltpu.VMEM) for c in const_shaped]
    out_shapes = tuple(jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bufs0)
    out_specs = [pl.BlockSpec((block, b.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for b in bufs0]

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=buf_specs + const_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )

    # column-targeted external geoid refresh: read the kinematic position
    # columns, run the EGM96 rowgather in plain XLA, write the geoid_N
    # column back — no full repack
    pos = None
    if vehicle is not None:
        from flightjax.ops import geodesy as geo
        gN = spec.column_of("s/vehicle/geoid_N")
        xk0 = state.x["vehicle"]["kinematics"]
        if "q_ew" in xk0:
            pos = spec.column_of("x/vehicle/kinematics/q_ew")
            n_e_of = geo.nvector_from_qew
        elif "n_e" in xk0:
            pos = spec.column_of("x/vehicle/kinematics/n_e")
            n_e_of = lambda cols: cols

    def step_packed(bufs):
        bufs = call(*bufs, *const_shaped)
        bufs = (bufs,) if not isinstance(bufs, (tuple, list)) else tuple(bufs)
        if pos is not None:
            g, off, size = pos
            cols = jax.lax.slice_in_dim(bufs[g], off, off + size, axis=1)
            N = geo.geoid_height(n_e_of(cols)).astype(bufs[gN[0]].dtype)
            buf = jax.lax.dynamic_update_slice(
                bufs[gN[0]], N[:, None], (0, gN[1]))
            bufs = tuple(buf if i == gN[0] else b for i, b in enumerate(bufs))
        return bufs

    return bufs0, step_packed, unpack
