"""Differentiable simulation: gradients through whole rollouts.

The reference can only differentiate its models by finite differences at a
point (`linearization.jl:89-111`); here the entire hybrid simulation — RK4
stages, masked discrete updates, table physics — is one pure JAX program, so
`jax.grad` flows end-to-end through arbitrarily long `lax.scan` rollouts.
That unlocks workflows the reference has no counterpart for:

- open-loop trajectory optimization (shape an input schedule to hit a
  terminal or integrated objective),
- parameter identification (fit physical constants to logged trajectories),
- gradient-refined trim (polish a trim point on the true rollout).

Memory for reverse-mode over long horizons is handled with
`jax.checkpoint` over scan segments (rematerialize segment interiors on the
backward pass instead of storing every RK4 stage).
"""

from functools import partial

import jax
import jax.numpy as jnp

from flightjax.core.modeling import canonical


def rollout(sim, state, n_steps, ctx=(), segment=None):
    """Differentiable fixed-step rollout: advance `n_steps` and return the
    final SimState. Pure (jit/grad/vmap-composable).

    `segment`: rematerialization chunk for reverse-mode AD. With segment=K,
    the scan runs as ceil(n/K) checkpointed segments — backward-pass memory
    drops from O(n_steps) saved RK4 stages to O(K + n/K) at the cost of one
    extra forward evaluation (`jax.checkpoint` over each segment). None =
    plain scan (fine for short horizons or forward-only use)."""

    def step_block(st, k):
        def body(s, _):
            return sim.step(s, ctx), None
        st, _ = jax.lax.scan(body, st, None, length=k)
        return st

    if segment is None or segment >= n_steps:
        return step_block(state, n_steps)

    n_seg, rem = divmod(n_steps, segment)
    ckpt_block = jax.checkpoint(partial(step_block, k=segment))

    def seg_body(st, _):
        return ckpt_block(st), None

    state, _ = jax.lax.scan(seg_body, state, None, length=n_seg)
    if rem:
        state = jax.checkpoint(partial(step_block, k=rem))(state)
    return state


def open_loop(sim, state, u_schedule, apply_u=None, ctx=(), save_y=False):
    """Roll with a per-step input schedule (pytree with leading time axis).
    Each step applies `apply_u(state, u_t) -> state` (default: replace
    `state.u` wholesale) before advancing. Returns (final_state, ys) where
    ys is the stacked per-step output pytree when save_y else None.
    Differentiable in `u_schedule` — the handle for open-loop trajectory
    optimization."""
    if apply_u is None:
        apply_u = lambda st, u_t: st._replace(u=u_t)

    def body(st, u_t):
        st = apply_u(st, u_t)
        st = sim.step(st, ctx)
        y = sim.output(st, ctx) if save_y else None
        return st, y

    return jax.lax.scan(body, state, u_schedule)


def fit(loss_fn, params0, steps=100, optimizer=None, jit=True):
    """Minimize `loss_fn(params) -> scalar` with optax (Adam 1e-2 default).
    Returns (params, losses). The per-step update is one jitted function —
    rollout + grad + optimizer fuse into a single XLA executable."""
    import optax

    opt = optimizer if optimizer is not None else optax.adam(1e-2)
    params = canonical(params0)
    opt_state = opt.init(params)

    def update(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    if jit:
        update = jax.jit(update)

    losses = []
    for _ in range(steps):
        params, opt_state, loss = update(params, opt_state)
        losses.append(float(loss))
    return params, jnp.asarray(losses)
