"""Packed-carry scan boundary: exact roundtrip and step equivalence."""

import jax
import pytest
import jax.numpy as jnp

from flightjax.core.sim import Simulation
from flightjax.models.robot2d import Robot
from flightjax.parallel.packed import make_packer, packed_scan_step

BATCH = 8


def _batched_state():
    sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
    s0 = sim.init()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (BATCH,) + jnp.shape(l)), s0)
    return sim, state


@pytest.mark.fast
def test_roundtrip_exact():
    _, state = _batched_state()
    spec, pack, unpack = make_packer(state)
    rt = unpack(pack(state))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(rt)):
        assert a.dtype == b.dtype and a.shape == b.shape
        assert bool(jnp.all(a == b))
    # one group buffer per dtype family, bools folded into int32
    assert set(spec.keys) <= {"float32", "float64", "int32"}


def test_packed_step_equivalence():
    sim, state = _batched_state()
    bufs0, body, unpack = packed_scan_step(lambda s: sim.step(s, ()), state)

    def roll_packed(bufs):
        c, _ = jax.lax.scan(lambda c, _: (body(c), None), bufs, None,
                            length=10)
        return unpack(c)

    def roll_plain(st):
        c, _ = jax.lax.scan(
            lambda c, _: (jax.vmap(lambda s: sim.step(s, ()))(c), None),
            st, None, length=10)
        return c

    a = jax.jit(roll_packed)(bufs0)
    b = jax.jit(roll_plain)(state)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert bool(jnp.all(la == lb)), "packed scan must be bit-identical"


def test_roundtrip_exact_fast_xla():
    # mosaic_safe=False flattens higher-rank tails with plain reshapes
    # (the scan-boundary variant used by plain-XLA fleet rolls)
    _, state = _batched_state()
    # add a rank-3 leaf to exercise the reshape path
    state = dict(state=state,
                 extra=jnp.arange(BATCH * 6.0).reshape(BATCH, 2, 3))
    spec, pack, unpack = make_packer(state, mosaic_safe=False)
    rt = unpack(pack(state))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(rt)):
        assert a.dtype == b.dtype and a.shape == b.shape
        assert bool(jnp.all(a == b))


def test_packed_step_equivalence_fast_xla():
    sim, state = _batched_state()
    spec, pack, unpack = make_packer(state, mosaic_safe=False)

    def roll_packed(bufs):
        def body(bufs, _):
            st = jax.vmap(lambda s: sim.step(s, ()))(unpack(bufs))
            return pack(st), None
        c, _ = jax.lax.scan(body, bufs, None, length=10)
        return unpack(c)

    def roll_plain(st):
        c, _ = jax.lax.scan(
            lambda c, _: (jax.vmap(lambda s: sim.step(s, ()))(c), None),
            st, None, length=10)
        return c

    a = jax.jit(roll_packed)(pack(state))
    b = jax.jit(roll_plain)(state)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert bool(jnp.all(la == lb)), "packed scan must be bit-identical"
