"""Temporal keypoint smoothing: OneEuroFilter port.

Port of the vendored filter (ref: vit_pose/vit_utils/post_processing/
one_euro_filter.py:19+): adaptive low-pass whose cutoff rises with speed —
low jitter when still, low lag when moving. Offered both as a stateful
host-side class (reference-compatible) and a jittable lax.scan over whole
trajectories (TPU-friendly batch form).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _smoothing_factor(t_e, cutoff):
    r = 2 * math.pi * cutoff * t_e
    return r / (r + 1)


def _exp_smooth(a, x, x_prev):
    return a * x + (1 - a) * x_prev


class OneEuroFilter:
    """Stateful scalar/array filter (reference-compatible API)."""

    def __init__(self, t0, x0, dx0=0.0, min_cutoff=1.7, beta=0.3, d_cutoff=30.0):
        self.min_cutoff = float(min_cutoff)
        self.beta = float(beta)
        self.d_cutoff = float(d_cutoff)
        self.x_prev = np.asarray(x0, float)
        self.dx_prev = np.full_like(self.x_prev, dx0)
        self.t_prev = float(t0)

    def __call__(self, t, x):
        t_e = t - self.t_prev
        x = np.asarray(x, float)
        a_d = _smoothing_factor(t_e, self.d_cutoff)
        dx = (x - self.x_prev) / t_e
        dx_hat = _exp_smooth(a_d, dx, self.dx_prev)
        cutoff = self.min_cutoff + self.beta * np.abs(dx_hat)
        a = 2 * math.pi * cutoff * t_e / (2 * math.pi * cutoff * t_e + 1)
        x_hat = a * x + (1 - a) * self.x_prev
        self.x_prev = x_hat
        self.dx_prev = dx_hat
        self.t_prev = t
        return x_hat


def one_euro_trajectory(times, xs, min_cutoff=1.7, beta=0.3, d_cutoff=30.0):
    """Jittable whole-trajectory form: times (T,), xs (T, ...) -> smoothed."""
    times = jnp.asarray(times)
    xs = jnp.asarray(xs)

    def step(carry, inp):
        x_prev, dx_prev, t_prev = carry
        t, x = inp
        t_e = t - t_prev
        r_d = 2 * jnp.pi * d_cutoff * t_e
        a_d = r_d / (r_d + 1)
        dx = (x - x_prev) / t_e
        dx_hat = a_d * dx + (1 - a_d) * dx_prev
        cutoff = min_cutoff + beta * jnp.abs(dx_hat)
        r = 2 * jnp.pi * cutoff * t_e
        a = r / (r + 1)
        x_hat = a * x + (1 - a) * x_prev
        return (x_hat, dx_hat, t), x_hat

    init = (xs[0], jnp.zeros_like(xs[0]), times[0])
    _, out = jax.lax.scan(step, init, (times[1:], xs[1:]))
    return jnp.concatenate([xs[:1], out], axis=0)
