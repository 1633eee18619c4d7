"""Linearization: exact Jacobians via jax.jacobian (replacing the reference's
FiniteDiff, `linearization.jl:89-111`), labeled state-space containers with
subsystem extraction (`linearization.jl:26-152`), and the LinearizedSS as a
simulatable component (`linearization.jl:157-192`).
"""

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flightjax.core.modeling import Component


@dataclass
class LinearizedSS:
    """ẋ = ẋ0 + A (x - x0) + B (u - u0); y = y0 + C (x - x0) + D (u - u0),
    with per-axis labels for subsystem slicing."""
    x0: np.ndarray
    u0: np.ndarray
    y0: np.ndarray
    x_dot0: np.ndarray
    A: np.ndarray
    B: np.ndarray
    C: np.ndarray
    D: np.ndarray
    x_labels: Sequence[str] = field(default_factory=list)
    u_labels: Sequence[str] = field(default_factory=list)
    y_labels: Sequence[str] = field(default_factory=list)

    # -------------------------------------------------- label-based slicing

    def _idx(self, labels, keep):
        return np.asarray([list(labels).index(k) for k in keep], dtype=int)

    def subsystem(self, x=None, u=None, y=None):
        """Keep only the named states/inputs/outputs
        (`linearization.jl:113-152`)."""
        xi = self._idx(self.x_labels, x) if x is not None else np.arange(len(self.x0))
        ui = self._idx(self.u_labels, u) if u is not None else np.arange(len(self.u0))
        yi = self._idx(self.y_labels, y) if y is not None else np.arange(len(self.y0))
        return LinearizedSS(
            x0=self.x0[xi], u0=self.u0[ui], y0=self.y0[yi],
            x_dot0=self.x_dot0[xi],
            A=self.A[np.ix_(xi, xi)], B=self.B[np.ix_(xi, ui)],
            C=self.C[np.ix_(yi, xi)], D=self.D[np.ix_(yi, ui)],
            x_labels=[self.x_labels[i] for i in xi],
            u_labels=[self.u_labels[i] for i in ui],
            y_labels=[self.y_labels[i] for i in yi])

    def delete_vars(self, x=(), u=(), y=()):
        """Drop the named variables (`linearization.jl:148-152`)."""
        keep_x = [l for l in self.x_labels if l not in x]
        keep_u = [l for l in self.u_labels if l not in u]
        keep_y = [l for l in self.y_labels if l not in y]
        return self.subsystem(x=keep_x, u=keep_u, y=keep_y)


_JAC_CACHE = {}


def linearize(f, h, x0, u0, x_labels=None, u_labels=None, y_labels=None,
              captures=(), cache_key=None):
    """Linearize ẋ = f(x, u, *captures), y = h(x, u, *captures) about
    (x0, u0) with exact autodiff Jacobians. f/h take and return flat jnp
    arrays; `captures` (extra pytree context, e.g. the trim point) is passed
    through as traced arguments.

    All four Jacobians come from ONE jitted forward-mode pass (n_x + n_u
    tangents through a single trace — the state-space is wide in outputs and
    narrow in inputs, so jacfwd beats jacrev, and jitting replaces the eager
    per-column dispatch storm). With `cache_key` set, the compiled pass is
    reused across calls — the caller guarantees f/h vary between calls only
    through (x0, u0, captures), which is what makes 28-point envelope sweeps
    pay one compile instead of 28.

    Runs pinned to the host CPU backend: linearization is offline design-time
    work, pathologically slow over a remote-accelerator tunnel (and needs no
    accelerator)."""
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        x0 = jnp.asarray(x0)
        u0 = jnp.asarray(u0)

        def build():
            def fh(x, u, *cap):
                return f(x, u, *cap), h(x, u, *cap)

            @jax.jit
            def jac_pass(x, u, *cap):
                (A, B), (C, D) = jax.jacfwd(fh, argnums=(0, 1))(x, u, *cap)
                x_dot0, y0 = fh(x, u, *cap)
                return A, B, C, D, x_dot0, y0

            return jac_pass

        if cache_key is not None:
            jac_pass = _JAC_CACHE.get(cache_key)
            if jac_pass is None:
                jac_pass = _JAC_CACHE[cache_key] = build()
        else:
            jac_pass = build()
        A, B, C, D, x_dot0, y0 = jac_pass(x0, u0, *captures)
    n_x, n_u, n_y = len(x0), len(u0), len(y0)
    return LinearizedSS(
        x0=np.asarray(x0), u0=np.asarray(u0), y0=np.asarray(y0),
        x_dot0=np.asarray(x_dot0),
        A=np.asarray(A).reshape(n_x, n_x), B=np.asarray(B).reshape(n_x, n_u),
        C=np.asarray(C).reshape(n_y, n_x), D=np.asarray(D).reshape(n_y, n_u),
        x_labels=list(x_labels) if x_labels else [f"x{i}" for i in range(n_x)],
        u_labels=list(u_labels) if u_labels else [f"u{i}" for i in range(n_u)],
        y_labels=list(y_labels) if y_labels else [f"y{i}" for i in range(n_y)])


class LinearStateSpace(Component):
    """A LinearizedSS as a simulatable continuous component
    (`linearization.jl:157-192`)."""

    def __init__(self, lss: LinearizedSS):
        self.lss = lss
        self._A = jnp.asarray(lss.A)
        self._B = jnp.asarray(lss.B)
        self._C = jnp.asarray(lss.C)
        self._D = jnp.asarray(lss.D)
        self._x0 = jnp.asarray(lss.x0)
        self._u0 = jnp.asarray(lss.u0)
        self._y0 = jnp.asarray(lss.y0)
        self._xd0 = jnp.asarray(lss.x_dot0)

    def init_x(self):
        return jnp.asarray(self.lss.x0)

    def init_u(self):
        return jnp.asarray(self.lss.u0)

    def f_ode(self, x, u, s, t):
        dx = x - self._x0
        du = u - self._u0
        x_dot = self._xd0 + self._A @ dx + self._B @ du
        y = self._y0 + self._C @ dx + self._D @ du
        return x_dot, y
