"""Attribute the plain-step time to subsystems by rolling each piece alone.

Builds the same kinematics+air | systems | dynamics decomposition the
cluster kernels use (clusterstep._make_cluster_step_split) but as plain
vmapped XLA, and times 200-iteration scans where each body runs the piece
4x (matching its per-step RK4 stage count).

Run: python tools/exp_bisect.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

BATCH = 4096
STEPS = 200
EPS = 1e-12  # keeps a real data dependency between scan iterations


def roll_and_time(body, carry, label):
    @jax.jit
    def roll(c):
        return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                            length=STEPS)[0]

    t0 = time.perf_counter()
    carry = jax.block_until_ready(roll(carry))
    compile_s = time.perf_counter() - t0
    carry = jax.block_until_ready(roll(carry))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        carry = roll(carry)
    jax.block_until_ready(carry)
    us = (time.perf_counter() - t0) / (n * STEPS) * 1e6
    print(f"{label}: {us:.1f} us/step (x4 stages inside) "
          f"[compile {compile_s:.1f}s]", flush=True)


def main():
    from flightjax.models.c172 import flagship_sim
    from flightjax.parallel.megakernel import find_vehicle
    from flightjax.physics.atmosphere import air_data
    from flightjax.physics.dynamics import DynamicsU

    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (BATCH,) + jnp.shape(l)), state0)
    vehicle = find_vehicle(sim.system)
    kin_c, sys_c, dyn_c = (vehicle.kinematics, vehicle.systems,
                           vehicle.dynamics)
    atm_c, trn_c = vehicle.atmosphere, vehicle.terrain

    xv = state.x["vehicle"]
    uv = state.u["vehicle"]
    sv = state.s["vehicle"]
    t = state.t

    def k1_lane(x_kin, x_dyn, geoid_N, u_atm, t):
        kin_dot, kin = kin_c.f_ode(x_kin, x_dyn, geoid_N, t)
        atm_d = atm_c.atmospheric_data(u_atm, kin.n_e, kin.h_o)
        return kin_dot, kin, air_data(atm_d, kin)

    vk1 = jax.vmap(k1_lane)
    _, kin0, air0 = vk1(xv["kinematics"], xv["dynamics"], sv["geoid_N"],
                        uv["atm"], t)

    def k2_lane(x_sys, u_sys, s_sys, u_trn, kin, air, t):
        trn_fn = lambda n_e=None: trn_c.terrain_data(u_trn, n_e)
        sys_dot, sys_y = sys_c.f_ode(x_sys, u_sys, s_sys, t, kin, air,
                                     trn_fn)
        return sys_dot, sys_y.mp_b, sys_y.wr_b, sys_y.hr_b

    vk2 = jax.vmap(k2_lane)
    _, mp0, wr0, hr0 = vk2(xv["systems"], uv["systems"], sv["systems"],
                           uv["trn"], kin0, air0, t)

    def k3_lane(x_dyn, mp_b, wr_b, hr_b, q_eb, r_eb_e, t):
        dyn_u = DynamicsU(mp_sum_b=mp_b, wr_sum_b=wr_b, ho_sum_b=hr_b,
                          q_eb=q_eb, r_eb_e=r_eb_e)
        dyn_dot, _ = dyn_c.f_ode(x_dyn, dyn_u, None, t)
        return dyn_dot

    vk3 = jax.vmap(k3_lane)

    def add(tree, dot):
        return jax.tree.map(lambda a, b: a + EPS * b, tree, dot)

    def body_kin(c):
        for _ in range(4):
            kd, _, _ = vk1(c, xv["dynamics"], sv["geoid_N"], uv["atm"], t)
            c = add(c, kd)
        return c

    def body_sys(c):
        for _ in range(4):
            sd, _, _, _ = vk2(c, uv["systems"], sv["systems"], uv["trn"],
                              kin0, air0, t)
            c = add(c, sd)
        return c

    def body_dyn(c):
        for _ in range(4):
            dd = vk3(c, mp0, wr0, hr0, kin0.q_eb, kin0.r_eb_e, t)
            c = add(c, dd)
        return c

    roll_and_time(body_kin, xv["kinematics"], "kin+atm+air x4")
    roll_and_time(body_sys, xv["systems"], "systems        x4")
    roll_and_time(body_dyn, xv["dynamics"], "dynamics       x4")


if __name__ == "__main__":
    main()
