"""Fleet-scale data parallelism: vmapped fleets on one chip, shard_map DP
over a device mesh.

The reference is a single-vehicle, single-process simulator (SURVEY.md
§2.5); the fleet axis is THE scaling dimension of the TPU rebuild:
- batch (data) parallelism: `vmap` over a leading fleet axis of the SimState
  pytree — one Model instance per aircraft becomes one lane per aircraft
- multi-chip: `shard_map` over a 1-D ("dp",) mesh with the fleet axis
  sharded; per-lane physics stays local, fleet reductions ride ICI
  (`jax.lax.pmean/psum`); multi-host scales the same code over DCN via
  jax.distributed
- Monte Carlo config: per-lane randomized wind / payload mass / CG /
  initial condition perturbations.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from flightjax.physics.atmosphere import G_STD


def broadcast_state(state, batch):
    """Tile a single SimState across a leading fleet axis."""
    return jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state)


def fleet_step_fn(sim, ctx=()):
    """Jittable fleet step: SimState with leading batch axis -> next.
    Routed through `Simulation.fleet_step` so the EGM96 geoid refresh runs
    at the fleet level, gated to every `sim.geoid_every`-th step."""
    return jax.jit(lambda s: sim.fleet_step(s, ctx))


def fleet_rollout(sim, state, n_steps, ctx=(), unroll=1):
    """Scan a fleet forward n_steps (no logging — the throughput path).
    The jitted roll is cached on the Simulation (same contract as
    `Simulation.run`): repeated rollouts reuse one XLA executable instead
    of re-tracing a fresh closure per call."""
    key = ("fleet_roll", n_steps, unroll)
    roll = sim._run_cache.get(key)
    if roll is None:

        @jax.jit
        def roll(st, ctx):
            def body(s, _):
                return sim.fleet_step(s, ctx), None
            st, _ = jax.lax.scan(body, st, None, length=n_steps,
                                 unroll=unroll)
            return st

        sim._run_cache[key] = roll
    return roll(state, ctx)


def fleet_metrics(state, veh_y_fn=None):
    """Cheap fleet-level summaries from a batched world SimState."""
    out = {"t": jnp.mean(state.t)}
    s = state.s
    if isinstance(s, dict) and "terminated" in s:
        out["terminated_frac"] = jnp.mean(s["terminated"].astype(jnp.float32))
    return out


def fleet_rollout_loads(sim, state, n_steps, ctx=(), sample_every=5,
                        unroll=1):
    """Roll the fleet forward while tracking each lane's peak load factor
    n = |f_c|/g (specific force at the CoM) — the gust-load / exceedance
    consumer of the atmospheric-disturbance models (physics/turbulence.py).

    The load requires the full output evaluation (an extra f_ode), so it
    is sampled every `sample_every` steps instead of every step: gust
    correlation times are seconds (L/V) while steps are 10-20 ms, so
    peaks are captured while the overhead stays at 1/sample_every of a
    step. Returns (final_state, peak_n) with peak_n shaped [batch].
    Cached on the Simulation like `fleet_rollout`."""
    n_outer, rem = divmod(int(n_steps), int(sample_every))
    if rem:
        raise ValueError("n_steps must be a multiple of sample_every")
    key = ("fleet_roll_loads", n_steps, sample_every, unroll)
    roll = sim._run_cache.get(key)
    if roll is None:

        def load(st, ctx):
            y = jax.vmap(lambda s: sim.output(s, ctx))(st)
            f = y.vehicle.dynamics.f_c_c
            return jnp.linalg.norm(f, axis=-1) / G_STD

        @jax.jit
        def roll(st, ctx):
            def inner(s, _):
                return sim.fleet_step(s, ctx), None

            def outer(carry, _):
                s, peak = carry
                s, _ = jax.lax.scan(inner, s, None, length=sample_every,
                                    unroll=unroll)
                return (s, jnp.maximum(peak, load(s, ctx))), None

            carry, _ = jax.lax.scan(outer, (st, load(st, ctx)), None,
                                    length=n_outer)
            return carry

        sim._run_cache[key] = roll
    return roll(state, ctx)


def exceedance(peaks, thresholds):
    """Exceedance fractions: for each threshold, the fraction of lanes
    whose peak exceeds it — the certification-style summary of a
    turbulent Monte Carlo fleet. A NaN peak (a lane that diverged — the
    most violently loaded outcome, not the safest) is counted as
    exceeding every threshold. Returns [len(thresholds)]."""
    peaks = jnp.asarray(peaks)
    peaks = jnp.where(jnp.isnan(peaks), jnp.inf, peaks)
    th = jnp.asarray(thresholds)
    return jnp.mean(peaks[None, :] > th[:, None], axis=1)


# ----------------------------------------------------------- Monte Carlo

def monte_carlo_c172(state, key, wind_std=5.0, payload_std=15.0,
                     fuel_range=(0.2, 0.9), h_jitter=50.0):
    """Per-lane randomized wind (NED), payload masses (CG shift), fuel load
    and altitude over a batched C172 world SimState. Returns the perturbed
    fleet state."""
    batch = state.t.shape[0]
    k_wind, k_pld, k_fuel, k_h, k_turb = jax.random.split(key, 5)

    u = state.u
    veh_u = dict(u["vehicle"])
    atm = dict(veh_u["atm"])
    atm["wind"] = wind_std * jax.random.normal(k_wind, (batch, 3))
    veh_u["atm"] = atm

    sys_u = dict(veh_u["systems"])
    pld = dict(sys_u["pld"])
    for i, name in enumerate(("pilot", "copilot", "baggage")):
        kk = jax.random.fold_in(k_pld, i)
        pld[name] = jnp.clip(pld[name]
                             + payload_std * jax.random.normal(kk, (batch,)),
                             0.0, 100.0)
    sys_u["pld"] = pld
    veh_u["systems"] = sys_u

    # Dryden turbulence (optional, physics/turbulence.py): give every lane
    # its own counter-based noise stream, with the block offset derived
    # from `key` so two fleets randomized with different keys draw
    # different gust realizations (pooling their exceedance statistics
    # stays valid); W20/severity stays whatever the caller set (0 = off,
    # the init default)
    if "turb" in veh_u:
        base = jax.random.randint(k_turb, (), 0, jnp.int32(2**31 - 1) - batch)
        veh_u["turb"] = dict(veh_u["turb"],
                             seed=base + jnp.arange(batch, dtype=jnp.int32))

    x = state.x
    veh_x = dict(x["vehicle"])
    sys_x = dict(veh_x["systems"])
    sys_x["fuel"] = jax.random.uniform(k_fuel, (batch,),
                                       minval=fuel_range[0],
                                       maxval=fuel_range[1])
    veh_x["systems"] = sys_x
    kin_x = dict(veh_x["kinematics"])
    if "h_e" in kin_x:
        kin_x["h_e"] = kin_x["h_e"] + h_jitter * jax.random.normal(k_h, (batch,))
        veh_x["kinematics"] = kin_x
    veh_u_out = dict(u, vehicle=veh_u)
    return state._replace(x=dict(x, vehicle=veh_x), u=veh_u_out)


# ------------------------------------------------------------- mesh DP

def shard_fleet(state, mesh_axis="dp", devices=None):
    """Place a batched SimState with the fleet axis sharded over a 1-D mesh.
    Returns (mesh, sharded_state)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if devices is None:
        devices = jax.devices()
    mesh = Mesh(np.asarray(devices), (mesh_axis,))
    sharding = NamedSharding(mesh, P(mesh_axis))
    return mesh, jax.device_put(state, sharding)


def sharded_rollout_fn(sim, mesh, n_steps, ctx=(), mesh_axis="dp"):
    """shard_map fleet rollout: per-shard vmapped scan + a pmean fleet
    metric over ICI. Returns a jitted fn(state) -> (state, t_mean)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(st):
        def body(s, _):
            return sim.fleet_step(s, ctx), None
        st, _ = jax.lax.scan(body, st, None, length=n_steps)
        t_mean = jax.lax.pmean(jnp.mean(st.t), axis_name=mesh_axis)
        return st, t_mean

    spec = P(mesh_axis)

    def wrapped(state):
        specs = jax.tree.map(lambda _: spec, state)
        return shard_map(local, mesh=mesh, in_specs=(specs,),
                         out_specs=(specs, P()))(state)

    return jax.jit(wrapped)


def sharded_loads_fn(sim, mesh, n_steps, thresholds, ctx=(),
                     sample_every=5, mesh_axis="dp"):
    """Multi-chip gust-load study: the `fleet_rollout_loads` peak tracking
    inside shard_map, with the exceedance fractions reduced over ICI
    (`pmean` of per-shard fractions == global fraction, since shards are
    equal-sized). Returns a jitted fn(state) -> (state, peaks, fractions)
    with peaks sharded like the fleet and fractions replicated."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    n_outer, rem = divmod(int(n_steps), int(sample_every))
    if rem:
        raise ValueError("n_steps must be a multiple of sample_every")
    th = jnp.asarray(thresholds, dtype=jnp.float32)

    def load(st):
        y = jax.vmap(lambda s: sim.output(s, ctx))(st)
        return jnp.linalg.norm(y.vehicle.dynamics.f_c_c, axis=-1) / G_STD

    def local(st):
        def inner(s, _):
            return sim.fleet_step(s, ctx), None

        def outer(carry, _):
            s, peak = carry
            s, _ = jax.lax.scan(inner, s, None, length=sample_every)
            return (s, jnp.maximum(peak, load(s))), None

        (st, peak), _ = jax.lax.scan(outer, (st, load(st)), None,
                                     length=n_outer)
        safe = jnp.where(jnp.isnan(peak), jnp.inf, peak)
        frac = jax.lax.pmean(
            jnp.mean(safe[None, :] > th[:, None], axis=1),
            axis_name=mesh_axis)
        return st, peak, frac

    spec = P(mesh_axis)

    def wrapped(state):
        specs = jax.tree.map(lambda _: spec, state)
        return shard_map(local, mesh=mesh, in_specs=(specs,),
                         out_specs=(specs, spec, P()))(state)

    return jax.jit(wrapped)
