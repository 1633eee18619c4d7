"""Measure [B,15,15] batched-matmul variants on the chip — the Kalman
covariance recursions' hot shape (estimation.py; the MXU pads each 15x15
to 128-wide tiles, so the padded-MXU form may lose to a VPU-style
broadcast-multiply-reduce contraction).

Run: python tools/exp_mm15.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, 15, 15), jnp.float32)
    Bm = jax.random.normal(jax.random.fold_in(key, 1), (B, 15, 15),
                           jnp.float32)

    def mm_mxu_highest(a, b):
        with jax.default_matmul_precision("highest"):
            return a @ b

    def mm_mxu_high(a, b):
        with jax.default_matmul_precision("high"):
            return a @ b

    def mm_vpu(a, b):
        # broadcast-multiply-reduce: [B,15,15,1]*[B,1,15,15] summed over
        # the shared axis — elementwise VPU work, no MXU tile padding
        return (a[:, :, :, None] * b[:, None, :, :]).sum(axis=2)

    def mm_unrolled(a, b):
        # explicit k-sum of rank-1 outer products (15 fused FMAs)
        acc = a[:, :, 0:1] * b[:, 0:1, :]
        for k in range(1, 15):
            acc = acc + a[:, :, k:k + 1] * b[:, k:k + 1, :]
        return acc

    variants = {"mxu_highest": mm_mxu_highest, "mxu_high": mm_mxu_high,
                "vpu_bcast": mm_vpu, "vpu_unrolled": mm_unrolled}
    ref = None
    REP = 200
    for name, fn in variants.items():
        # chain REP dependent matmuls so the measurement isn't overlap-bound
        @jax.jit
        def chained(a, b, fn=fn):
            def body(c, _):
                return fn(c, b) / 4.0, None   # /4 keeps values bounded
            c, _ = jax.lax.scan(body, a, None, length=REP)
            return c

        out = jax.block_until_ready(chained(A, Bm))
        t0 = time.perf_counter()
        for _ in range(3):
            out = chained(A, Bm)
        jax.block_until_ready(out)
        us = (time.perf_counter() - t0) / (3 * REP) * 1e6
        one = jax.block_until_ready(jax.jit(fn)(A, Bm))
        if ref is None:
            ref = one
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(one - ref)))
        print(f"{name:14s}: {us:8.2f} us per [B={B},15,15] matmul "
              f"(max |diff| vs highest: {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
