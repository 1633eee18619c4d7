"""Profiling utilities: step timing and HLO compile report."""

import jax.numpy as jnp
import pytest

from flightjax.core.sim import Simulation
from flightjax.models.robot2d import Robot
from flightjax.utils.profiling import compile_report, step_timer


@pytest.mark.fast
def test_step_timer_and_compile_report():
    sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
    state = sim.init()

    rep = compile_report(lambda s: sim.step(s, ()), state)
    assert rep["fusions"] >= 1 and rep["hlo_chars"] > 1000

    res = step_timer(lambda s: sim.step(s, ()), state, iters=20)
    assert res["per_iter_us"] > 0
