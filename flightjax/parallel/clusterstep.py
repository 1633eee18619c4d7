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

from flightjax.core.modeling import bwhere, tree_where
from flightjax.core.sim import SimState
from flightjax.parallel.pallas_block import pallas_block
from flightjax.parallel.megakernel import find_vehicle

# optional list set by tools/probe_pallas_kernels.py: every built cluster
# kernel is appended as (name, wrapped_fn, example_args_batch_leading) so
# each Mosaic kernel can be compiled in isolation against the remote
# compile helper (which caps per-request memory)
KERNEL_SINK = None


def make_cluster_step(sim, state, ctx=(), block=1024, interpret=False,
                      split="vehicle", layout="major"):
    """Build `step(state) -> state` (batched SimState in/out) with the hot
    physics inside Pallas cluster kernels. `state` must be batched with
    every leaf's leading dim == B, B % block == 0.

    split="vehicle": the whole model f_ode per stage kernel (fewest
    launches). split="subsystems": three kernels per stage — kinematics +
    atmosphere/airdata | vehicle systems | Newton-Euler dynamics — for
    compilers that cap per-kernel program size (the remote Mosaic helper
    SIGKILLs on the whole-vehicle kernel).

    layout="minor" (split="subsystems" only): the step consumes and
    produces a batch-MINOR SimState (`pallas_block.to_minor(state)`),
    keeping the fleet on the 128-wide lane dimension through the whole
    scan. Inside the kernels a 3-vector temp is then [3, block] instead of
    [block, 3] — ~16-40x less VMEM tile padding (the Newton-Euler kernel
    drops from 72 MiB scoped VMEM to a few MiB) and far less padded-tile
    VPU waste. Convert once before the scan and back after with
    `to_minor`/`to_major`."""
    if split in ("subsystems", "fine", "hybrid"):
        # "hybrid" = the fine decomposition, but the kernels whose summed
        # compile cost OOMs the remote Mosaic helper (per-leg gear +
        # finish-systems parts) stay plain vmapped XLA inside the same
        # module; only the five cheap-to-compile clusters go to Pallas.
        return _make_cluster_step_split(sim, state, ctx, block, interpret,
                                        minor=(layout == "minor"),
                                        fine=(split in ("fine", "hybrid")),
                                        plain_names=(HYBRID_PLAIN
                                                     if split == "hybrid"
                                                     else frozenset()))
    assert layout == "major", "layout='minor' requires split='subsystems'"
    sys = sim.system
    dt = sim.dt
    batch = int(jnp.shape(state.t)[0])
    vehicle = find_vehicle(sys)

    def _no_geoid(fn):
        from flightjax.physics.aircraftbase import geoid_deferred

        def run(*args):
            with geoid_deferred():
                return fn(*args)
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

    def finish_lane(x, ksum, u, s, t_new):
        # ksum = k1 + 2k2 + 2k3 + k4, accumulated by the stage scan in the
        # same association order as the former in-kernel combine
        x_new = jax.tree.map(
            lambda xv, kv: xv + (dt / 6.0) * kv, x, ksum)
        x2, s2 = sys.f_step(x_new, u, s, t_new, *ctx)
        return x2, s2

    finish_b = _no_geoid(jax.vmap(finish_lane))
    finish_kernel = pallas_block(
        finish_b, (state.x, zeros_x, state.u, state.s, state.t),
        batch=batch, block=block, interpret=interpret, name="rk4_finish")

    # trivial periodic? (no avionics anywhere -> f_periodic is identity)
    aircraft = getattr(sys, "aircraft", None)
    trivial_periodic = (aircraft is not None
                        and getattr(aircraft, "avionics", None) is None)
    spp = sim.steps_per_periodic

    def step(st: SimState) -> SimState:
        t, i, x, u, s = st[:5]

        # stages via lax.scan so the stage kernel appears once in the
        # compiled module (unrolled, 4 instantiations overran the remote
        # Mosaic compile helper's memory cap); see the subsystems split
        # below for the association-order note
        zeros = jax.tree.map(jnp.zeros_like, x)
        stage_c = jnp.asarray([0.0, 0.5 * dt, 0.5 * dt, dt], t.dtype)
        stage_w = jnp.asarray([1.0, 2.0, 2.0, 1.0], t.dtype)

        def stage_body(carry, cw):
            kprev, acc = carry
            c, w = cw
            kcur = stage_kernel(x, kprev, u, s, t + c,
                                jnp.zeros_like(t) + c)
            acc = jax.tree.map(lambda a, b: a + w * b, acc, kcur)
            return (kcur, acc), None

        (_, ksum), _ = jax.lax.scan(
            stage_body, (zeros, zeros), (stage_c, stage_w))

        t_new = jnp.asarray(sim.t_start + (i + 1) * dt, jnp.result_type(t))
        i_new = i + 1
        x, s = finish_kernel(x, ksum, u, s, t_new)

        if vehicle is not None:
            # same fleet-level scalar gating as `Simulation.fleet_step`:
            # the two [B, 1441] EGM96 grid rows are the widest HBM read in
            # the step; with a scalar predicate lax.cond genuinely skips it
            K = max(1, int(getattr(sim, "geoid_every", 1)))

            def _refresh(op):
                xv_, sv_ = op
                return jax.vmap(vehicle.refresh_geoid)(xv_, sv_)

            if K == 1:
                s_veh = _refresh((x["vehicle"], s["vehicle"]))
            else:
                i0 = i_new.reshape(-1)[0]
                s_veh = jax.lax.cond((i0 % K) == 0, _refresh,
                                     lambda op: op[1],
                                     (x["vehicle"], s["vehicle"]))
            s = dict(s, vehicle=s_veh)

        if not trivial_periodic:
            fires = (i_new % spp) == 0  # [B]: needs leading-axis broadcast
            k = i_new // spp - 1
            new_xus = jax.vmap(
                lambda xx, uu, ss, tt, kk: sys.f_periodic(
                    xx, uu, ss, tt, kk, *ctx))(x, u, s, t_new, k)
            x, u, s = jax.tree.map(lambda a, b: bwhere(fires, a, b),
                                   new_xus, (x, u, s))

        # Pallas path is uncompensated; residuals pass through untouched
        return SimState(t=t_new, i=i_new, x=x, u=u, s=s, c=st.c)

    return step


# kernels kept as plain vmapped XLA in split="hybrid": each compiles alone
# (332-1555 s) but their SUM in one module OOMs the remote Mosaic helper
HYBRID_PLAIN = frozenset(
    {"k_ldg0", "k_ldg1", "k_ldg2", "k_fin_act", "k_fin_ldg0", "k_fin_ldg1",
     "k_fin_ldg2", "k_fin_rest"})


def _make_cluster_step_split(sim, state, ctx, block, interpret, minor=False,
                             fine=False, plain_names=frozenset()):
    """split="subsystems" implementation: 3 kernels per RK4 stage
    (kinematics+atmosphere/airdata | systems | dynamics) and 2 finish
    kernels, each well under the remote Mosaic compiler's program-size cap.
    Orchestration mirrors `Vehicle.f_ode` / `Vehicle.f_step`
    (`physics/aircraftbase.py`, itself `aircraftbase.jl:142-181`).

    `fine=True` further splits the systems kernel into three —
    act+aero | landing gear | powerplant+mass aggregation — via the
    model's `Systems.f_ode_parts()` protocol: the whole-systems kernel
    alone SIGKILLs the remote Mosaic compile helper (memory cap), measured
    on the C172 at batch 4096.

    With `minor=True` every kernel is built with `pallas_block_minor` (the
    same per-lane functions, vmapped over the LAST axis) and the step's
    SimState is batch-minor throughout; `state` is still passed
    batch-leading (it is only used for shapes)."""
    import jax
    from flightjax.core.modeling import bscale
    from flightjax.parallel.pallas_block import (pallas_block,
                                                 pallas_block_minor)
    from flightjax.physics.atmosphere import air_data
    from flightjax.physics.dynamics import DynamicsU

    sys_ = sim.system
    dt = sim.dt
    batch = int(jnp.shape(state.t)[0])
    vehicle = find_vehicle(sys_)
    assert vehicle is not None, "subsystems split requires a Vehicle model"
    kin_c, sys_c, dyn_c = (vehicle.kinematics, vehicle.systems,
                           vehicle.dynamics)
    atm_c, trn_c = vehicle.atmosphere, vehicle.terrain

    xv0 = state.x["vehicle"]
    uv0 = state.u["vehicle"]
    sv0 = state.s["vehicle"]
    term0 = state.s["terminated"]
    t0 = state.t
    adt0 = jnp.zeros_like(state.t)
    zk = jax.tree.map(jnp.zeros_like, xv0)

    def build(lane, args, name):
        if name in plain_names:
            # hybrid: stay plain XLA (same lane fn, vmapped to the ambient
            # layout) — XLA fuses it with the surrounding glue
            if minor:
                return jax.vmap(lane, in_axes=-1, out_axes=-1)
            return jax.vmap(lane)
        if minor:
            k = pallas_block_minor(lane, args, batch=batch, block=block,
                                   interpret=interpret, name=name)
        else:
            k = pallas_block(jax.vmap(lane), args, batch=batch, block=block,
                             interpret=interpret, name=name)
        if KERNEL_SINK is not None:
            KERNEL_SINK.append((name, k, args))
        return k

    def fma(xt, kt, adt):
        return jax.tree.map(lambda a, b: a + bscale(adt, b), xt, kt)

    def alive_scale(tree, term):
        alive = 1.0 - term
        return jax.tree.map(lambda v: bscale(alive, v), tree)

    # ---- K1: kinematics + atmosphere + airdata (stage-FMA folded in)
    def k1_lane(x_kin, x_dyn, k_kin, k_dyn, geoid_N, u_atm, t, adt, term):
        xi_kin = fma(x_kin, k_kin, adt)
        xi_dyn = fma(x_dyn, k_dyn, adt)
        kin_dot, kin = kin_c.f_ode(xi_kin, xi_dyn, geoid_N, t)
        atm_d = atm_c.atmospheric_data(u_atm, kin.n_e, kin.h_o)
        air = air_data(atm_d, kin)
        return alive_scale(kin_dot, term), kin, air, xi_dyn

    k1 = build(
        k1_lane,
        (xv0["kinematics"], xv0["dynamics"], zk["kinematics"],
         zk["dynamics"], sv0["geoid_N"], uv0["atm"], t0, adt0, term0),
        "k_kinair")

    _, kin_ex, air_ex, _ = jax.eval_shape(
        k1_lane, *(jax.tree.map(lambda l: l[0], a) for a in (
            xv0["kinematics"], xv0["dynamics"], zk["kinematics"],
            zk["dynamics"], sv0["geoid_N"], uv0["atm"], t0, adt0, term0)))
    kin_ex = jax.tree.map(
        lambda a: jnp.zeros((batch,) + a.shape, a.dtype), kin_ex)
    air_ex = jax.tree.map(
        lambda a: jnp.zeros((batch,) + a.shape, a.dtype), air_ex)

    # ---- K2: vehicle systems (stage-FMA folded in)
    def k2_lane(x_sys, k_sys, u_sys, s_sys, u_trn, kin, air, t, adt, term):
        xi_sys = fma(x_sys, k_sys, adt)
        trn_fn = lambda n_e=None: trn_c.terrain_data(u_trn, n_e)
        sys_dot, sys_y = sys_c.f_ode(xi_sys, u_sys, s_sys, t, kin, air,
                                     trn_fn)
        return (alive_scale(sys_dot, term), sys_y.mp_b, sys_y.wr_b,
                sys_y.hr_b)

    if not fine:
        k2 = build(
            k2_lane,
            (xv0["systems"], zk["systems"], uv0["systems"], sv0["systems"],
             uv0["trn"], kin_ex, air_ex, t0, adt0, term0),
            "k_systems")
    else:
        # ---- K2a/b/c: act+aero | gear | powerplant+mass (f_ode_parts)
        actaero_p, ldg_p, pwp_p = sys_c.f_ode_parts()
        act_keys = tuple(sys_c.act.init_x_extra().keys())
        xs0, zs0 = xv0["systems"], zk["systems"]
        us0, ss0 = uv0["systems"], sv0["systems"]
        x_act0 = {k: xs0[k] for k in act_keys}
        zk_act0 = {k: zs0[k] for k in act_keys}
        fdt = t0.dtype

        def k2a_lane(x_act, x_aero, k_act, k_aero, u_act, s_aero, u_trn,
                     kin, air, t, adt, term):
            xi_act = fma(x_act, k_act, adt)
            xi_aero = fma(x_aero, k_aero, adt)
            trn_fn = lambda n_e=None: trn_c.terrain_data(u_trn, n_e)
            act_dot, aero_dot, gear_u, thr_mix, wr_aero = actaero_p(
                xi_act, xi_aero, u_act, s_aero, t, kin, air, trn_fn)
            return (alive_scale(act_dot, term),
                    alive_scale(aero_dot, term), gear_u, thr_mix, wr_aero)

        k2a = build(
            k2a_lane,
            (x_act0, xs0["aero"], zk_act0, zs0["aero"], us0["act"],
             ss0["aero"], uv0["trn"], kin_ex, air_ex, t0, adt0, term0),
            "k_actaero")

        gear_u_ex = {"steering": jnp.zeros((batch, 3), fdt),
                     "braking": jnp.zeros((batch, 3), fdt)}
        thr_ex = {"throttle": jnp.zeros((batch,), fdt),
                  "mixture": jnp.zeros((batch,), fdt)}
        from flightjax.physics.dynamics import Wrench
        wr3_ex = Wrench(F=jnp.zeros((batch, 3), fdt),
                        tau=jnp.zeros((batch, 3), fdt))

        # one kernel per gear leg: the 3-leg kernel alone SIGKILLs the
        # remote Mosaic compile helper (measured at batch 4096; see
        # Systems.f_ode_gear_legs). The leg wrenches sum in XLA glue.
        leg_fns = sys_c.f_ode_gear_legs()

        def make_leg_lane(leg_fn):
            def kleg_lane(x_frc, k_frc, steer, brake, u_trn, kin, t, adt,
                          term):
                xi = fma(x_frc, k_frc, adt)
                trn_fn = lambda n_e=None: trn_c.terrain_data(u_trn, n_e)
                frc_dot, wr = leg_fn(xi, steer, brake, t, kin, trn_fn)
                return alive_scale(frc_dot, term), wr
            return kleg_lane

        klegs = [build(
            make_leg_lane(fn),
            (xs0["ldg"]["frc"][:, i], zs0["ldg"]["frc"][:, i],
             gear_u_ex["steering"][:, i], gear_u_ex["braking"][:, i],
             uv0["trn"], kin_ex, t0, adt0, term0),
            f"k_ldg{i}") for i, fn in enumerate(leg_fns)]

        def k2b(x_ldg, k_ldg, gear_u, u_trn, kin, t, adt, term):
            dots, wr = [], None
            for i, kleg in enumerate(klegs):
                if minor:  # leg axis leads; batch is minor
                    xf, kf = x_ldg["frc"][i], k_ldg["frc"][i]
                    st, br = gear_u["steering"][i], gear_u["braking"][i]
                else:
                    xf, kf = x_ldg["frc"][:, i], k_ldg["frc"][:, i]
                    st, br = (gear_u["steering"][:, i],
                              gear_u["braking"][:, i])
                d, w = kleg(xf, kf, st, br, u_trn, kin, t, adt, term)
                dots.append(d)
                wr = w if wr is None else jax.tree.map(jnp.add, wr, w)
            frc_dot = jnp.stack(dots, axis=0 if minor else 1)
            return {"frc": frc_dot}, wr

        def k2c_lane(x_pwp, x_fuel, k_pwp, k_fuel, u_pwp, s_pwp, thr_mix,
                     u_pld, kin, air, wr_aero, wr_ldg, t, adt, term):
            xi_pwp = fma(x_pwp, k_pwp, adt)
            xi_fuel = fma(x_fuel, k_fuel, adt)
            pwp_dot, fuel_dot, mp_b, wr_b, hr_b = pwp_p(
                xi_pwp, xi_fuel, u_pwp, s_pwp, thr_mix, u_pld, t, kin,
                air, wr_aero, wr_ldg)
            return (alive_scale(pwp_dot, term),
                    alive_scale(fuel_dot, term), mp_b, wr_b, hr_b)

        k2c = build(
            k2c_lane,
            (xs0["pwp"], xs0["fuel"], zs0["pwp"], zs0["fuel"], us0["pwp"],
             ss0["pwp"], thr_ex, us0["pld"], kin_ex, air_ex, wr3_ex,
             wr3_ex, t0, adt0, term0),
            "k_pwp")

        def k2(x_sys, k_sys, u_sys, s_sys, u_trn, kin, air, t, adt, term):
            act_dot, aero_dot, gear_u, thr_mix, wr_aero = k2a(
                {k: x_sys[k] for k in act_keys},
                x_sys["aero"], {k: k_sys[k] for k in act_keys},
                k_sys["aero"], u_sys["act"], s_sys["aero"], u_trn, kin,
                air, t, adt, term)
            ldg_dot, wr_ldg = k2b(x_sys["ldg"], k_sys["ldg"], gear_u,
                                  u_trn, kin, t, adt, term)
            pwp_dot, fuel_dot, mp_b, wr_b, hr_b = k2c(
                x_sys["pwp"], x_sys["fuel"], k_sys["pwp"], k_sys["fuel"],
                u_sys["pwp"], s_sys["pwp"], thr_mix, u_sys["pld"], kin,
                air, wr_aero, wr_ldg, t, adt, term)
            sys_dot = dict({"aero": aero_dot, "ldg": ldg_dot,
                            "pwp": pwp_dot, "fuel": fuel_dot}, **act_dot)
            return sys_dot, mp_b, wr_b, hr_b

    mp_ex, wr_ex, hr_ex = (jax.eval_shape(
        k2_lane, *(jax.tree.map(lambda l: l[0], a) for a in (
            xv0["systems"], zk["systems"], uv0["systems"], sv0["systems"],
            uv0["trn"], kin_ex, air_ex, t0, adt0, term0)))[1:])
    mp_ex, wr_ex, hr_ex = (jax.tree.map(
        lambda a: jnp.zeros((batch,) + a.shape[1:]
                            if a.shape[:1] == (batch,) else
                            (batch,) + a.shape, a.dtype), e)
        for e in (mp_ex, wr_ex, hr_ex))

    # ---- K3: Newton-Euler dynamics
    def k3_lane(xi_dyn, mp_b, wr_b, hr_b, q_eb, r_eb_e, t, term):
        dyn_u = DynamicsU(mp_sum_b=mp_b, wr_sum_b=wr_b, ho_sum_b=hr_b,
                          q_eb=q_eb, r_eb_e=r_eb_e)
        dyn_dot, _ = dyn_c.f_ode(xi_dyn, dyn_u, None, t)
        return alive_scale(dyn_dot, term)

    k3 = build(
        k3_lane,
        (xv0["dynamics"], mp_ex, wr_ex, hr_ex,
         jnp.zeros((batch, 4), t0.dtype), jnp.zeros((batch, 3), t0.dtype),
         t0, term0),
        "k_dynamics")

    def f_ode_stage(xv, kv, uv, sv, term, t, adt):
        kin_dot, kin, air, xi_dyn = k1(
            xv["kinematics"], xv["dynamics"], kv["kinematics"],
            kv["dynamics"], sv["geoid_N"], uv["atm"], t, adt, term)
        sys_dot, mp_b, wr_b, hr_b = k2(
            xv["systems"], kv["systems"], uv["systems"], sv["systems"],
            uv["trn"], kin, air, t, adt, term)
        dyn_dot = k3(xi_dyn, mp_b, wr_b, hr_b, kin.q_eb, kin.r_eb_e, t,
                     term)
        return {"kinematics": kin_dot, "dynamics": dyn_dot,
                "systems": sys_dot}

    # ---- K4: RK4 combine (kin+dyn) + kinematics f_step + new context.
    # Takes the stage-weighted k-sum (k1+2k2+2k3+k4), not the four stage
    # trees: the stage loop below accumulates it in the same association
    # order the combine previously used, so the result is bit-identical
    # while the kernel's input count (and VMEM footprint) shrinks.
    def k4_lane(x_kin, x_dyn, ksum_kin, ksum_dyn, geoid_N, u_atm, t_new):
        comb = lambda xv, kv: jax.tree.map(
            lambda a, b: a + (dt / 6.0) * b, xv, kv)
        x_kin2 = comb(x_kin, ksum_kin)
        x_dyn2 = comb(x_dyn, ksum_dyn)
        x_kin2, _ = kin_c.f_step(x_kin2, x_dyn2, None, t_new)
        _, kin = kin_c.f_ode(x_kin2, x_dyn2, geoid_N, t_new)
        atm_d = atm_c.atmospheric_data(u_atm, kin.n_e, kin.h_o)
        air = air_data(atm_d, kin)
        return x_kin2, x_dyn2, kin, air

    k4 = build(
        k4_lane,
        (xv0["kinematics"], xv0["dynamics"], zk["kinematics"],
         zk["dynamics"], sv0["geoid_N"], uv0["atm"], t0),
        "k_finish_kin")

    # ---- K5: RK4 combine (systems) + systems f_step
    if not fine:
        def k5_lane(x_sys, ksum_sys, u_sys, s_sys, u_trn, kin, air,
                    t_new):
            x_sys2 = jax.tree.map(
                lambda a, b: a + (dt / 6.0) * b, x_sys, ksum_sys)
            trn_fn = lambda n_e=None: trn_c.terrain_data(u_trn, n_e)
            x_sys3, s_sys2 = sys_c.f_step(x_sys2, u_sys, s_sys, t_new,
                                          kin, air, trn_fn)
            return x_sys3, s_sys2

        k5 = build(
            k5_lane,
            (xv0["systems"], zk["systems"], uv0["systems"],
             sv0["systems"], uv0["trn"], kin_ex, air_ex, t0),
            "k_finish_sys")
    else:
        # the whole finish-systems kernel (3x strut geometry + engine
        # FSM) alone SIGKILLs the remote Mosaic compile helper — split
        # per Systems.f_step_parts: act pass | one strut kernel per leg
        # | stall+gear-reset+engine-FSM rest.
        pre_p, fleg_fns, rest_p = sys_c.f_step_parts()

        def kf_pre_lane(x_act, ksum_act, u_act, t_new):
            x_act2 = jax.tree.map(
                lambda a, b: a + (dt / 6.0) * b, x_act, ksum_act)
            return pre_p(x_act2, u_act, t_new)

        kf_pre = build(kf_pre_lane,
                       (x_act0, zk_act0, us0["act"], t0), "k_fin_act")

        def make_fleg_lane(leg_fn):
            def kfleg_lane(steer, brake, u_trn, kin):
                trn_fn = lambda n_e=None: trn_c.terrain_data(u_trn, n_e)
                return leg_fn(steer, brake, kin, trn_fn)
            return kfleg_lane

        steer_ex = jnp.zeros((batch,), fdt)
        kflegs = [build(
            make_fleg_lane(fn), (steer_ex, steer_ex, uv0["trn"], kin_ex),
            f"k_fin_ldg{i}") for i, fn in enumerate(fleg_fns)]

        w3_ex = jnp.zeros((batch, 3), fdt)

        def kf_rest_lane(x_sys, ksum_sys, u_sys, s_sys, kin, air, t_new,
                         wow, alpha_ts, xi_dot):
            x_sys2 = jax.tree.map(
                lambda a, b: a + (dt / 6.0) * b, x_sys, ksum_sys)
            return rest_p(x_sys2, u_sys["pwp"], s_sys, t_new, kin, air,
                          wow, alpha_ts, xi_dot)

        kf_rest = build(
            kf_rest_lane,
            (xv0["systems"], zk["systems"], uv0["systems"],
             sv0["systems"], kin_ex, air_ex, t0, w3_ex, w3_ex, w3_ex),
            "k_fin_rest")

        def k5(x_sys, ksum_sys, u_sys, s_sys, u_trn, kin, air, t_new):
            gear_u = kf_pre(
                {k: x_sys[k] for k in act_keys},
                {k: ksum_sys[k] for k in act_keys}, u_sys["act"], t_new)
            outs = []
            for i, kfleg in enumerate(kflegs):
                if minor:
                    st, br = gear_u["steering"][i], gear_u["braking"][i]
                else:
                    st, br = (gear_u["steering"][:, i],
                              gear_u["braking"][:, i])
                outs.append(kfleg(st, br, u_trn, kin))
            ax = 0 if minor else 1
            wow, ats, xid = (jnp.stack([o[j] for o in outs], axis=ax)
                             for j in range(3))
            return kf_rest(x_sys, ksum_sys, u_sys, s_sys, kin, air,
                           t_new, wow, ats, xid)

    aircraft = getattr(sys_, "aircraft", None)
    trivial_periodic = (aircraft is not None
                        and getattr(aircraft, "avionics", None) is None)
    spp = sim.steps_per_periodic

    def step(st: SimState) -> SimState:
        t, i, x, u, s = st[:5]
        xv, uv, sv = x["vehicle"], u["vehicle"], s["vehicle"]
        term = s["terminated"]
        zeros = jax.tree.map(jnp.zeros_like, xv)

        # RK4 stages as a lax.scan over (dt-offset, weight) so each stage
        # kernel appears ONCE in the compiled module. With the stages
        # unrolled, k1/k2/k3 were instantiated 4x each — 14 Mosaic kernel
        # compiles per module — which SIGKILLed the remote compile helper
        # (memory cap); the scan form compiles 5. The weighted k-sum is
        # accumulated ((k1+2k2)+2k3)+k4, matching the association order of
        # the former in-kernel combine bit-for-bit.
        stage_c = jnp.asarray([0.0, 0.5 * dt, 0.5 * dt, dt], t.dtype)
        stage_w = jnp.asarray([1.0, 2.0, 2.0, 1.0], t.dtype)

        def stage_body(carry, cw):
            kprev, acc = carry
            c, w = cw
            adt = jnp.zeros_like(t) + c
            kcur = f_ode_stage(xv, kprev, uv, sv, term, t + c, adt)
            acc = jax.tree.map(lambda a, b: a + w * b, acc, kcur)
            return (kcur, acc), None

        (_, ksum), _ = jax.lax.scan(
            stage_body, (zeros, zeros), (stage_c, stage_w))

        t_new = jnp.asarray(sim.t_start + (i + 1) * dt, jnp.result_type(t))
        i_new = i + 1

        x_kin2, x_dyn2, kin2, air2 = k4(
            xv["kinematics"], xv["dynamics"],
            ksum["kinematics"], ksum["dynamics"],
            sv["geoid_N"], uv["atm"], t_new)
        x_sys2, s_sys2 = k5(
            xv["systems"], ksum["systems"],
            uv["systems"], sv["systems"], uv["trn"], kin2, air2, t_new)

        xv2 = {"kinematics": x_kin2, "dynamics": x_dyn2, "systems": x_sys2}
        sv2 = dict(sv, systems=s_sys2)
        ax = -1 if minor else 0  # batch axis of every leaf outside kernels
        # fleet-level scalar-gated geoid refresh (see Simulation.fleet_step)
        K = max(1, int(getattr(sim, "geoid_every", 1)))

        def _refresh(op):
            xv_, sv_ = op
            return jax.vmap(vehicle.refresh_geoid, in_axes=ax,
                            out_axes=ax)(xv_, sv_)

        if K == 1:
            sv2 = _refresh((xv2, sv2))
        else:
            i0 = i_new.reshape(-1)[0]
            sv2 = jax.lax.cond((i0 % K) == 0, _refresh, lambda op: op[1],
                               (xv2, sv2))
        crashed = s_sys2.get("crashed")
        term2 = jnp.logical_or(term, crashed) if crashed is not None else term

        x2 = dict(x, vehicle=xv2)
        s2 = dict(s, vehicle=sv2, terminated=term2)
        u2 = u
        if not trivial_periodic:
            fires = (i_new % spp) == 0
            kk = i_new // spp - 1
            new_xus = jax.vmap(
                lambda xx, uu, ss, tt, kv: sys_.f_periodic(
                    xx, uu, ss, tt, kv, *ctx),
                in_axes=ax, out_axes=ax)(x2, u2, s2, t_new, kk)
            # batch-minor leaves broadcast `fires` [B] on the trailing axis
            # natively; batch-leading rank>1 leaves need the leading-axis
            # expansion bwhere provides
            if minor:
                x2, u2, s2 = tree_where(fires, new_xus, (x2, u2, s2))
            else:
                x2, u2, s2 = jax.tree.map(
                    lambda a, b: bwhere(fires, a, b),
                    new_xus, (x2, u2, s2))

        # Pallas path is uncompensated; residuals pass through untouched
        return SimState(t=t_new, i=i_new, x=x2, u=u2, s=s2, c=st.c)

    return step
