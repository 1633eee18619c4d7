"""Cluster-kernel simulation step: the hybrid step as a handful of Pallas
kernels (vs. one untractable megakernel, vs. O(100) latency-bound XLA
fusions).

Layout per step (5 kernel launches + a few XLA ops):
- 4x STAGE kernel (one compilation): computes the RK4 stage state
  xi = x + a_i*dt * k_prev inside the kernel, then the full model f_ode.
- 1x FINISH kernel: RK4 combination x + dt/6 (k1+2k2+2k3+k4) followed by
  the model's f_step (quaternion renorm, stall hysteresis, engine FSM,
  gear regulator resets, crash latch).
- XLA glue: time/index bookkeeping, the EGM96 geoid rowgather (gathers do
  not lower in Mosaic — `Vehicle.geoid_in_step = False` semantics), and
  the (masked) f_periodic pass for models that have one.

Numerics are identical to `Simulation.step` with the plain RK4 (same
association order per leaf).
"""

import jax
import jax.numpy as jnp

from flightjax.core.modeling import tree_where
from flightjax.core.sim import SimState
from flightjax.parallel.pallas_block import pallas_block
from flightjax.parallel.megakernel import find_vehicle


def make_cluster_step(sim, state, ctx=(), block=512, interpret=False):
    """Build `step(state) -> state` (batched SimState in/out) with the hot
    physics inside Pallas cluster kernels. `state` must be batched with
    every leaf's leading dim == B, B % block == 0."""
    sys = sim.system
    dt = sim.dt
    batch = int(jnp.shape(state.t)[0])
    vehicle = find_vehicle(sys)

    def _no_geoid(fn):
        def run(*args):
            if vehicle is None:
                return fn(*args)
            old = vehicle.geoid_in_step
            vehicle.geoid_in_step = False
            try:
                return fn(*args)
            finally:
                vehicle.geoid_in_step = old
        return run

    # ---------------------------------------------------------- stage kernel

    def stage_lane(x, k_prev, u, s, t, adt):
        from flightjax.core.modeling import bscale
        xi = jax.tree.map(lambda xv, kv: xv + bscale(adt, kv), x, k_prev)
        xd, _ = sys.f_ode(xi, u, s, t, *ctx)
        return xd

    stage_b = _no_geoid(jax.vmap(stage_lane))

    zeros_x = jax.tree.map(jnp.zeros_like, state.x)
    adt_ex = jnp.zeros((batch,), state.t.dtype)
    stage_kernel = pallas_block(
        stage_b, (state.x, zeros_x, state.u, state.s, state.t, adt_ex),
        batch=batch, block=block, interpret=interpret, name="rk4_stage")

    # --------------------------------------------------------- finish kernel

    def finish_lane(x, k1, k2, k3, k4, u, s, t_new):
        x_new = jax.tree.map(
            lambda xv, a, b, c, d: xv + (dt / 6.0) * (a + 2 * b + 2 * c + d),
            x, k1, k2, k3, k4)
        x2, s2 = sys.f_step(x_new, u, s, t_new, *ctx)
        return x2, s2

    finish_b = _no_geoid(jax.vmap(finish_lane))
    finish_kernel = pallas_block(
        finish_b, (state.x, zeros_x, zeros_x, zeros_x, zeros_x,
                   state.u, state.s, state.t),
        batch=batch, block=block, interpret=interpret, name="rk4_finish")

    # trivial periodic? (no avionics anywhere -> f_periodic is identity)
    aircraft = getattr(sys, "aircraft", None)
    trivial_periodic = (aircraft is not None
                        and getattr(aircraft, "avionics", None) is None)
    spp = sim.steps_per_periodic

    def step(st: SimState) -> SimState:
        t, i, x, u, s = st
        half = jnp.full_like(t, 0.5 * dt)
        full = jnp.full_like(t, dt)
        zero = jnp.zeros_like(t)

        k1 = stage_kernel(x, jax.tree.map(jnp.zeros_like, x), u, s, t, zero)
        k2 = stage_kernel(x, k1, u, s, t + 0.5 * dt, half)
        k3 = stage_kernel(x, k2, u, s, t + 0.5 * dt, half)
        k4 = stage_kernel(x, k3, u, s, t + dt, full)

        t_new = sim.t_start + (i + 1) * dt
        i_new = i + 1
        x, s = finish_kernel(x, k1, k2, k3, k4, u, s, t_new)

        if vehicle is not None:
            s_veh = jax.vmap(vehicle.refresh_geoid)(x["vehicle"],
                                                    s["vehicle"])
            s = dict(s, vehicle=s_veh)

        if not trivial_periodic:
            fires = (i_new % spp) == 0
            k = i_new // spp - 1
            new_xus = jax.vmap(
                lambda xx, uu, ss, tt, kk: sys.f_periodic(
                    xx, uu, ss, tt, kk, *ctx))(x, u, s, t_new, k)
            x, u, s = tree_where(fires, new_xus, (x, u, s))

        return SimState(t=t_new, i=i_new, x=x, u=u, s=s)

    return step
