"""AoS vs SoA quaternion math on TPU: does keeping components as separate
[B] arrays (struct-of-arrays) let XLA fuse chains of quaternion ops into
far fewer kernels than the (..., 4) array form?

Motivation: the batch-4096 fleet-step HLO has 425 fusions in the scan body,
175 of them attributed to ops/quaternions.py — roughly one kernel per
quaternion op, because each op ends in a concatenate that forms a fusion
boundary. If SoA collapses a K-op chain into O(1) fusions, rewriting the
hot kinematics/dynamics math in SoA form is the next perf lever.

Prints one JSON line per variant: fusions in the scan body + us/step.
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 4096
CHAIN = 12   # quaternion ops per step, roughly one kinematics stage's worth
STEPS = 100


def qmul_aos(q1, q2):
    r1, v1 = q1[..., 0], q1[..., 1:]
    r2, v2 = q2[..., 0], q2[..., 1:]
    re = r1 * r2 - jnp.sum(v1 * v2, axis=-1)
    im = r1[..., None] * v2 + r2[..., None] * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([re[..., None], im], axis=-1)


def qrot_aos(q, v):
    q_re = q[..., 0:1]
    q_im = q[..., 1:4]
    return v + 2.0 * jnp.cross(q_im, q_re * v + jnp.cross(q_im, v))


def qmul_soa(a, b):
    (w1, x1, y1, z1), (w2, x2, y2, z2) = a, b
    return (w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2)


def qrot_soa(q, v):
    w, x, y, z = q
    vx, vy, vz = v
    # t = q_re*v + q_im x v
    tx = w * vx + (y * vz - z * vy)
    ty = w * vy + (z * vx - x * vz)
    tz = w * vz + (x * vy - y * vx)
    # v + 2 * q_im x t
    return (vx + 2.0 * (y * tz - z * ty),
            vy + 2.0 * (z * tx - x * tz),
            vz + 2.0 * (x * ty - y * tx))


def body_fusions(compiled):
    txt = compiled.as_text()
    m = re.search(r'\n(%[^\s]*region_0[^\s]* [^\n]*\n(?:[^\n]*\n)*?)(?=\n*%|\nENTRY)', txt)
    # robust fallback: count fusions in the largest computation
    comps = re.split(r'\n(?=%|ENTRY)', txt)
    big = max(comps, key=lambda c: c.count('\n'))
    return len(re.findall(r'= \S+ fusion\(', big))


def run(name, roll, carry):
    t0 = time.time()
    compiled = roll.lower(carry).compile()
    compile_s = time.time() - t0
    nfus = body_fusions(compiled)
    out = jax.block_until_ready(compiled(carry))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = compiled(out)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (n * STEPS) * 1e6
    print(json.dumps({"variant": name, "body_fusions": nfus,
                      "us_per_step": round(us, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    q0 = jax.random.normal(key, (BATCH, 4), jnp.float32)
    q0 = q0 / jnp.linalg.norm(q0, axis=-1, keepdims=True)
    v0 = jax.random.normal(key, (BATCH, 3), jnp.float32)

    @jax.jit
    def roll_aos(carry):
        def step(c, _):
            q, v = c
            for _ in range(CHAIN):
                q = qmul_aos(q, q0)
                v = qrot_aos(q, v)
            q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
            return (q, v), None
        c, _ = jax.lax.scan(step, carry, None, length=STEPS)
        return c

    @jax.jit
    def roll_soa(carry):
        qc = tuple(q0[:, i] for i in range(4))
        def step(c, _):
            q, v = c[:4], c[4:]
            for _ in range(CHAIN):
                q = qmul_soa(q, qc)
                v = qrot_soa(q, v)
            n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
            q = tuple(x / n for x in q)
            return q + v, None
        c, _ = jax.lax.scan(step, carry, None, length=STEPS)
        return c

    print(f"# devices: {jax.devices()}  batch={BATCH} chain={CHAIN}", flush=True)
    run("aos", roll_aos, (q0, v0))
    run("soa", roll_soa, tuple(q0[:, i] for i in range(4)) + tuple(v0[:, i] for i in range(3)))


if __name__ == "__main__":
    main()
