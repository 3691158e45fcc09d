"""Differentiable, vmappable ball-flight physics replacing MuJoCo datagen.

TPU-native rebuild of the reference's physics layer
(ref: syntheticdataset/helper.py:79-117 world XML,
syntheticdataset/mujocosimulation.py:112-219 simulation loop). The reference
drives the C MuJoCo engine one trajectory per CPU process; here the whole
physics is a jitted `lax.scan` over fixed steps, `vmap`-ed over thousands of
trajectories per TPU core.

The force model was *empirically identified* against the actual MuJoCo world
(mj_step probes of dv/dt at known states; see tests/test_physics.py):

  a     = -k_q |v| v  - k_s v  + k_m (omega x v)  - g zhat
  alpha = -k_w omega

  k_q = rho * C_blunt * pi r^2 / m      (blunt quadratic drag, C=0.235)
  k_s = 6 pi mu_air r / m               (Stokes viscous drag)
  k_m = rho * (4/3 pi r^3) / (2 m)      (Magnus, matches MuJoCo to <1%)
  k_w = 8 pi mu_air r^3 / I             (viscous spin decay, I = 2/5 m r^2)

matching MuJoCo's ellipsoid fluid model with
fluidcoef="0.235 0.25 0.0 1.0 1.0" (ref: helper.py:97) — the slender-drag
and Kutta-lift terms vanish for a sphere.

Integration mirrors MuJoCo's `implicit` integrator (implicit-in-velocity
Euler, dt=1e-3, ref: helper.py:81): one linearized solve
(I - dt J) dv = dt a(v) with the analytic 6x6 velocity Jacobian, then
r' = r + dt v'.

Contacts are event-based impulse maps fitted to MuJoCo's constraint solver
(pair solref="-1000000 -17", solreffriction="-0.0 -200.0",
friction="0.1 ...", ref: helper.py:110), which empirically gives:
  * table/net normal restitution  e ~ 0.99 (stiff spring, ~3 steps contact)
  * tangential slip decays as exp(-200 * t_contact), t_contact ~ 3 ms,
    capped by the Coulomb cone mu (1+e) |v_n|  (viscous friction reference)
  * spin update from the rigid-body impulse relation
    d omega = -(m r / I) (n x dv_t)
  * ground contact (floor: NOT in the XML pair list, so MuJoCo soft
    defaults apply) has slip-dependent restitution e ~ 0.04-0.25 with
    strong friction; the table box is solid to the floor, so its four
    side faces are contact surfaces too.
Torsional friction (mu_spin = 0.005) and table-edge contact normals are not
modeled (negligible for valid trajectories, which the mode validators filter
anyway, ref: mujocosimulation.py:206-211).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from upliftingtabletennis_tpu.core.geometry import (
    NET_TOTAL_HEIGHT,
    NET_TOTAL_WIDTH,
    TABLE_HEIGHT,
    TABLE_LENGTH,
    TABLE_WIDTH,
)

# --- physical constants (ref world XML, helper.py:79-117) -------------------
BALL_MASS = 0.0027  # kg
BALL_RADIUS = 0.02  # m
AIR_DENSITY = 1.225  # kg/m^3
AIR_VISCOSITY = 1.8e-5  # Pa s
GRAVITY = 9.81
DT = 1e-3  # MuJoCo timestep (helper.py:27)
FPS = 500  # save rate (helper.py:29)
MAX_SIMULATION_TIME = 1.0  # seconds (helper.py:28)

_BALL_INERTIA = 0.4 * BALL_MASS * BALL_RADIUS**2  # solid sphere
_AREA = jnp.pi * BALL_RADIUS**2
_VOLUME = 4.0 / 3.0 * jnp.pi * BALL_RADIUS**3

K_QUAD = AIR_DENSITY * 0.235 * float(_AREA) / BALL_MASS
K_STOKES = 6.0 * jnp.pi * AIR_VISCOSITY * BALL_RADIUS / BALL_MASS
K_MAGNUS = AIR_DENSITY * float(_VOLUME) / (2.0 * BALL_MASS)
K_SPIN = 8.0 * jnp.pi * AIR_VISCOSITY * BALL_RADIUS**3 / _BALL_INERTIA

# --- contact coefficients (fitted to MuJoCo, see module docstring) ----------
E_TABLE = 0.99
E_NET = 0.99  # same stiff contact pair as the table (measured 0.97-0.99)
# The FLOOR is not in the XML's explicit <contact> pair list
# (ref: helper.py:110-117 — only ball-table and ball-net pairs carry the
# stiff solref), so ball-floor contact runs MuJoCo's soft defaults with the
# elliptic friction cone, which couples tangential slip into the normal
# impulse: measured restitution off the reference floor rises ~0.03 -> 0.24
# as contact-point slip goes 0 -> 9 m/s, with strong tangential friction.
E_GROUND_BASE = 0.04
E_GROUND_SLIP = 0.022  # d e / d |slip| (1 / (m/s))
E_GROUND_MAX = 0.25
GROUND_MU = 1.0
GROUND_FRIC_DECAY = 1.0  # full one-shot rolling target (soft persistent contact)
# The net box: halfwidth 0.02 in x, y-halfsize TABLE_HEIGHT+NET_POST_OFFSET,
# z from TABLE_HEIGHT-NET_HEIGHT_ABOVE_TABLE to TABLE_HEIGHT+NET_HEIGHT_ABOVE_TABLE
# (ref: helper.py:100 — note the box extends BELOW the table top).
NET_HALF_THICKNESS = 0.02
NET_Y_HALF = TABLE_HEIGHT + 0.1525
NET_Z_BOTTOM = TABLE_HEIGHT - 0.1525
NET_Z_TOP = TABLE_HEIGHT + 0.1525
FRICTION_MU = 0.1
FRIC_DECAY = 1.0 - jnp.exp(-200.0 * 3e-3)  # slip fraction removed per bounce
_SLIP_RATIO = 1.0 + BALL_MASS * BALL_RADIUS**2 / _BALL_INERTIA  # = 3.5

CONTACT_Z_TABLE = TABLE_HEIGHT + BALL_RADIUS
CONTACT_Z_GROUND = BALL_RADIUS


class BallState(NamedTuple):
    r: jnp.ndarray  # (..., 3) position
    v: jnp.ndarray  # (..., 3) velocity
    w: jnp.ndarray  # (..., 3) angular velocity


def flight_accel(v: jnp.ndarray, w: jnp.ndarray):
    """Smooth-flight accelerations (a, alpha) for velocity/spin (..., 3)."""
    speed = jnp.linalg.norm(v, axis=-1, keepdims=True)
    a = (
        -K_QUAD * speed * v
        - K_STOKES * v
        + K_MAGNUS * jnp.cross(w, v)
        + jnp.array([0.0, 0.0, -GRAVITY], v.dtype)
    )
    alpha = -K_SPIN * w
    return a, alpha


def _cross_matrix(x):
    """[x]_cross such that [x]_cross @ y = x cross y. x: (..., 3)."""
    zero = jnp.zeros_like(x[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -x[..., 2], x[..., 1]], -1),
            jnp.stack([x[..., 2], zero, -x[..., 0]], -1),
            jnp.stack([-x[..., 1], x[..., 0], zero], -1),
        ],
        -2,
    )


def _implicit_velocity_update(v, w, dt):
    """One implicit-in-velocity Euler update of (v, w), MuJoCo-style.

    Solves (I6 - dt J) dvel = dt * accel(v) with the analytic Jacobian of the
    fluid forces; J couples v and omega through the Magnus term.
    """
    a, alpha = flight_accel(v, w)
    speed = jnp.linalg.norm(v, axis=-1, keepdims=True)
    eye = jnp.eye(3, dtype=v.dtype)
    safe = jnp.maximum(speed[..., None], 1e-9)
    # d a / d v
    Jvv = (
        -K_QUAD * (speed[..., None] * eye + v[..., :, None] * v[..., None, :] / safe)
        - K_STOKES * eye
        + K_MAGNUS * _cross_matrix(w)
    )
    # d a / d omega = -K_MAGNUS [v]x ;  d alpha / d omega = -K_SPIN I
    Jvw = -K_MAGNUS * _cross_matrix(v)
    Jww = jnp.broadcast_to(-K_SPIN * eye, Jvw.shape)
    Jvv = jnp.broadcast_to(Jvv, Jvw.shape)
    # (I6 - dt J) dvel = dt accel with J = [[Jvv, Jvw], [0, Jww]] block upper
    # triangular and Jww = -K_SPIN I diagonal: solve the omega block in
    # closed form, then one 3x3 cofactor solve for the velocity block.
    # (jnp.linalg.solve on batched 6x6 systems runs a pivoted LU that
    # dominates datagen runtime on TPU — this exact solve is elementwise.)
    dw = dt * alpha / (1.0 + dt * K_SPIN)
    bv = dt * a + dt * jnp.einsum("...ij,...j->...i", Jvw, dw)
    Av = jnp.eye(3, dtype=v.dtype) - dt * Jvv
    dv = _solve3x3(Av, bv)
    return v + dv, w + dw


def _solve3x3(A, b):
    """Exact 3x3 solve via the adjugate (vectorized over leading dims).

    A (..., 3, 3), b (..., 3). No pivoting: the integrator matrices are
    strongly diagonally dominant (I - dt*J with dt*||J|| << 1).
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) / det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) / det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) / det
    return jnp.stack([x0, x1, x2], axis=-1)


def _bounce_impulse(v, w, normal, e_n, mu, fric_decay):
    """Impulse map for a bounce against a plane with unit normal `normal`.

    Fitted to the MuJoCo constraint solver behavior (module docstring):
    normal restitution e_n; tangential slip u (contact-point velocity)
    reduced by `fric_decay` fraction, capped by the Coulomb cone; spin
    updated by the rigid-body impulse relation. e_n / mu / fric_decay may
    be scalars or per-element (...,) arrays (surface-selected contacts).
    """
    def keep(a):
        a = jnp.asarray(a, v.dtype)
        return a[..., None] if a.ndim else a  # broadcast against (..., 1)

    e_nk, muk, deck = keep(e_n), keep(mu), keep(fric_decay)
    v_n = jnp.sum(v * normal, axis=-1, keepdims=True)  # negative approaching
    v_t = v - v_n * normal
    # contact point at -R*normal: u = v_t + w x (-R n) (tangential part)
    u = v_t + jnp.cross(w, -BALL_RADIUS * normal)
    u = u - jnp.sum(u * normal, axis=-1, keepdims=True) * normal
    u_norm = jnp.linalg.norm(u, axis=-1, keepdims=True)
    u_hat = u / jnp.maximum(u_norm, 1e-9)

    dv_t_mag = jnp.minimum(
        deck * u_norm / _SLIP_RATIO, muk * (1.0 + e_nk) * jnp.abs(v_n)
    )
    dv_t = -dv_t_mag * u_hat

    v_out = v_t + dv_t - e_nk * v_n * normal
    dw = -(BALL_MASS * BALL_RADIUS / _BALL_INERTIA) * jnp.cross(normal, dv_t)
    w_out = w + dw
    return v_out, w_out


_Z = jnp.array([0.0, 0.0, 1.0])


def _ground_restitution(v, w):
    """Slip-dependent floor restitution (see E_GROUND_* above)."""
    normal = jnp.broadcast_to(_Z, v.shape)
    v_n = jnp.sum(v * normal, axis=-1, keepdims=True)
    u = (v - v_n * normal) + jnp.cross(w, -BALL_RADIUS * normal)
    u = u - jnp.sum(u * normal, axis=-1, keepdims=True) * normal
    slip = jnp.linalg.norm(u, axis=-1)
    return jnp.clip(E_GROUND_BASE + E_GROUND_SLIP * slip, E_GROUND_BASE, E_GROUND_MAX)


def step(state: BallState, dt: float = DT) -> BallState:
    """One physics step: implicit flight + fused event-based contacts.

    Contact surfaces (table top plane, the solid table box's four side
    faces below the top — ref: helper.py:100, pos z=H/2 half-size H/2, no
    under-table space — the floor, and the net box faces) are detected as
    plane crossings of the post-flight state; at dt=1 ms at most one
    surface can be crossed per substep (the planes are >= 4 cm apart at
    ball speeds <= 40 m/s), so ONE surface is selected by priority and a
    single `_bounce_impulse` + reflection executes. The earlier
    one-handler-per-surface sequence ran 5 impulse maps + 5 masked state
    rewrites every substep and made the contact phase ~as expensive as the
    implicit flight solve (PERF.md datagen section).
    """
    r, v, w = state
    v1, w1 = _implicit_velocity_update(v, w, dt)
    r1 = r + dt * v1

    x0, y0 = r[..., 0], r[..., 1]
    x, y, z = r1[..., 0], r1[..., 1], r1[..., 2]
    z0 = r[..., 2]

    # --- candidate hits on the raw post-flight state ---
    hit_top = (
        (z0 >= CONTACT_Z_TABLE) & (z < CONTACT_Z_TABLE) & (v1[..., 2] < 0)
        & (jnp.abs(x) < TABLE_LENGTH / 2) & (jnp.abs(y) < TABLE_WIDTH / 2)
    )
    below_top = z < TABLE_HEIGHT
    cx = TABLE_LENGTH / 2 + BALL_RADIUS
    sx = jnp.sign(x0)
    hit_sx = (
        (jnp.abs(x0) >= cx) & ((x - sx * cx) * sx < 0) & (v1[..., 0] * sx < 0)
        & (jnp.abs(y) < TABLE_WIDTH / 2 + BALL_RADIUS) & below_top
    )
    cy = TABLE_WIDTH / 2 + BALL_RADIUS
    sy = jnp.sign(y0)
    hit_sy = (
        (jnp.abs(y0) >= cy) & ((y - sy * cy) * sy < 0) & (v1[..., 1] * sy < 0)
        & (jnp.abs(x) < TABLE_LENGTH / 2 + BALL_RADIUS) & below_top
    )
    hit_gnd = (z0 >= CONTACT_Z_GROUND) & (z < CONTACT_Z_GROUND) & (v1[..., 2] < 0)
    cn = NET_HALF_THICKNESS + BALL_RADIUS
    sn = jnp.sign(x0)
    hit_net = (
        (jnp.abs(x0) >= cn) & ((x - sn * cn) * sn < 0) & (v1[..., 0] * sn < 0)
        & (jnp.abs(y) < NET_Y_HALF + BALL_RADIUS)
        & (z < NET_Z_TOP + BALL_RADIUS) & (z > NET_Z_BOTTOM - BALL_RADIUS)
    )

    # priority = the old sequential handler order
    hit_sx &= ~hit_top
    hit_sy &= ~(hit_top | hit_sx)
    hit_gnd &= ~(hit_top | hit_sx | hit_sy)
    hit_net &= ~(hit_top | hit_sx | hit_sy | hit_gnd)
    hit_any = hit_top | hit_sx | hit_sy | hit_gnd | hit_net

    # --- selected surface frame: axis one-hot, signed contact coord, normal
    ax0 = hit_sx | hit_net  # x-axis faces
    ax1 = hit_sy
    onehot = jnp.stack(
        [ax0, ax1, ~(ax0 | ax1)], axis=-1
    ).astype(v1.dtype)  # (.., 3); z-plane is the default slot
    sgn = jnp.where(ax0, jnp.where(hit_net, sn, sx), jnp.where(ax1, sy, 1.0))
    c_sel = jnp.where(
        hit_top, CONTACT_Z_TABLE,
        jnp.where(hit_sx, sx * cx,
                  jnp.where(hit_sy, sy * cy,
                            jnp.where(hit_net, sn * cn, CONTACT_Z_GROUND))),
    )
    normal = sgn[..., None] * onehot

    e_sel = jnp.where(hit_gnd, _ground_restitution(v1, w1),
                      jnp.where(hit_net, E_NET, E_TABLE))
    mu_sel = jnp.where(hit_gnd, GROUND_MU, FRICTION_MU)
    dec_sel = jnp.where(hit_gnd, GROUND_FRIC_DECAY, FRIC_DECAY)

    v_b, w_b = _bounce_impulse(v1, w1, normal, e_sel, mu_sel, dec_sel)
    # reflect the overshoot past the contact plane on the selected axis
    r_comp = jnp.sum(r1 * onehot, axis=-1)
    r_ref = c_sel - e_sel * (r_comp - c_sel)
    r_b = r1 * (1.0 - onehot) + r_ref[..., None] * onehot

    hit_e = hit_any[..., None]
    return BallState(
        jnp.where(hit_e, r_b, r1),
        jnp.where(hit_e, v_b, v1),
        jnp.where(hit_e, w_b, w1),
    )


def simulate(
    state0: BallState,
    n_frames: int = int(MAX_SIMULATION_TIME * FPS),
    substeps: int = int(round(1.0 / (FPS * DT))),
    dt: float = DT,
):
    """Simulate and save `n_frames` at the FPS save-rate grid.

    Returns BallState of stacked arrays with a leading time axis of length
    n_frames. Matches the reference's save loop exactly: one initial
    mj_step, then frame k is the state after 1 + k*substeps integrator steps
    with recorded time k / FPS (ref: mujocosimulation.py:116-150). Leading
    batch dims of state0 are preserved — batching needs no vmap.
    """
    state = step(state0, dt)  # ref does one mj_step before the save loop

    def frame_step(state, _):
        out = state
        for _ in range(substeps):
            state = step(state, dt)
        return state, out

    _, traj = jax.lax.scan(frame_step, state, None, length=n_frames)
    return traj


simulate_jit = jax.jit(simulate, static_argnums=(1, 2))
