"""Joint turbulence x sensor-grade navigation Monte Carlo (VERDICT r3
#6): one study that exercises the Dryden disturbance models, the sensor
suite, the fused INS/GPS estimator, the closed control loop, and the
fleet machinery TOGETHER. Full tier (trim + fresh closed-loop compile)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_joint_navigation_study_exceedance():
    from flightjax.demos.estimation_demos import joint_navigation_study

    r = joint_navigation_study(n_lanes=8, t_end=10.0,
                               key=jax.random.PRNGKey(5))
    att = np.asarray(r["peak_att_deg"])
    pos = np.asarray(r["peak_pos_m"])
    assert att.shape == (8,) and np.isfinite(att).all()
    assert pos.shape == (8,) and np.isfinite(pos).all()
    # lanes saw genuinely different turbulence/sensor conditions
    assert att.std() > 1e-3 and pos.std() > 1e-3
    # closed loop stayed sane in moderate turbulence with consumer IMUs
    assert att.max() < 10.0, att
    assert pos.max() < 25.0, pos
    # exceedance curves are monotone non-increasing in the threshold
    for key in ("att_exceedance", "pos_exceedance"):
        frac = np.asarray(r[key])
        assert np.all(np.diff(frac) <= 1e-12), (key, frac)
        assert np.all((0.0 <= frac) & (frac <= 1.0))
    # no FDI false alarms despite the deliberate filter/truth sensor-
    # grade mismatch (ADVICE r4: high-grade-noise lanes run a knowingly
    # optimistic catalog-tuned filter)
    assert all(v == 0.0 for v in r["alarm_fraction"].values()), \
        r["alarm_fraction"]
