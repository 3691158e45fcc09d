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
    updated by the rigid-body impulse relation.
    """
    e_n = jnp.asarray(e_n, v.dtype)
    e_nk = e_n[..., None] if e_n.ndim else e_n  # broadcast against (..., 1)
    v_n = jnp.sum(v * normal, axis=-1, keepdims=True)  # negative approaching
    v_t = v - v_n * normal
    # contact point at -R*normal: u = v_t + w x (-R n) (tangential part)
    u = v_t + jnp.cross(w, -BALL_RADIUS * normal)
    u = u - jnp.sum(u * normal, axis=-1, keepdims=True) * normal
    u_norm = jnp.linalg.norm(u, axis=-1, keepdims=True)
    u_hat = u / jnp.maximum(u_norm, 1e-9)

    dv_t_mag = jnp.minimum(
        fric_decay * u_norm / _SLIP_RATIO, mu * (1.0 + e_nk) * jnp.abs(v_n)
    )
    dv_t = -dv_t_mag * u_hat

    v_out = v_t + dv_t - e_nk * v_n * normal
    dw = -(BALL_MASS * BALL_RADIUS / _BALL_INERTIA) * jnp.cross(normal, dv_t)
    w_out = w + dw
    return v_out, w_out


_Z = jnp.array([0.0, 0.0, 1.0])


def _handle_plane_bounce(r_old, state_new, z_contact, on_region, e_n,
                         mu=FRICTION_MU, fric_decay=FRIC_DECAY):
    """Branchless z-plane bounce: if the step crossed z_contact downward and
    the (x, y) position is inside `on_region`, reflect at the crossing point.

    r_old: (..., 3) pre-step position; state_new: post-step BallState.
    e_n may be a per-element array (slip-dependent ground restitution).
    """
    r_new, v_new, w_new = state_new
    crossed = (r_old[..., 2] >= z_contact) & (r_new[..., 2] < z_contact) & (v_new[..., 2] < 0)
    hit = crossed & on_region

    normal = jnp.broadcast_to(_Z, v_new.shape)
    v_b, w_b = _bounce_impulse(v_new, w_new, normal, e_n, mu, fric_decay)
    # reflect the overshoot below the plane
    z_ref = z_contact + e_n * (z_contact - r_new[..., 2])
    r_b = jnp.concatenate([r_new[..., :2], z_ref[..., None]], axis=-1)

    hit_e = hit[..., None]
    return BallState(
        jnp.where(hit_e, r_b, r_new),
        jnp.where(hit_e, v_b, v_new),
        jnp.where(hit_e, w_b, w_new),
    ), hit


def _ground_restitution(v, w):
    """Slip-dependent floor restitution (see E_GROUND_* above)."""
    normal = jnp.broadcast_to(_Z, v.shape)
    v_n = jnp.sum(v * normal, axis=-1, keepdims=True)
    u = (v - v_n * normal) + jnp.cross(w, -BALL_RADIUS * normal)
    u = u - jnp.sum(u * normal, axis=-1, keepdims=True) * normal
    slip = jnp.linalg.norm(u, axis=-1)
    return jnp.clip(E_GROUND_BASE + E_GROUND_SLIP * slip, E_GROUND_BASE, E_GROUND_MAX)


def _handle_table_side_bounce(r_old, state_new):
    """Bounces off the table box's four SIDE faces.

    The reference table is a solid box reaching the floor
    (ref: helper.py:100 — pos z=H/2, half-size H/2), so no under-table
    space exists; a ball can strike the vertical faces below the top. Our
    top-surface plane alone would let floor-bounced balls fly under the
    table and register phantom hit intervals.
    """
    r_new, v_new, w_new = state_new
    below_top = r_new[..., 2] < TABLE_HEIGHT

    out = state_new
    for axis, half, other_half in (
        (0, TABLE_LENGTH / 2, TABLE_WIDTH / 2),
        (1, TABLE_WIDTH / 2, TABLE_LENGTH / 2),
    ):
        r_new, v_new, w_new = out
        c = half + BALL_RADIUS
        other = 1 - axis
        in_band = jnp.abs(r_new[..., other]) < other_half + BALL_RADIUS
        s = jnp.sign(r_old[..., axis])
        crossed = (
            (jnp.abs(r_old[..., axis]) >= c)
            & ((r_new[..., axis] - s * c) * s < 0)
            & (v_new[..., axis] * s < 0)
        )
        hit = crossed & in_band & below_top
        e = jnp.zeros(3).at[axis].set(1.0)
        normal = s[..., None] * e
        v_b, w_b = _bounce_impulse(v_new, w_new, normal, E_TABLE, FRICTION_MU, FRIC_DECAY)
        a_ref = s * c - E_TABLE * (r_new[..., axis] - s * c)
        r_b = jnp.where(
            jnp.arange(3) == axis, a_ref[..., None], r_new
        )
        hit_e = hit[..., None]
        out = BallState(
            jnp.where(hit_e, r_b, r_new),
            jnp.where(hit_e, v_b, v_new),
            jnp.where(hit_e, w_b, w_new),
        )
    return out, None


def _handle_net_bounce(r_old, state_new):
    """Bounce off the net box faces at x = +-(half-thickness + ball radius)."""
    r_new, v_new, w_new = state_new
    x_contact = NET_HALF_THICKNESS + BALL_RADIUS
    in_net_region = (
        (jnp.abs(r_new[..., 1]) < NET_Y_HALF + BALL_RADIUS)
        & (r_new[..., 2] < NET_Z_TOP + BALL_RADIUS)
        & (r_new[..., 2] > NET_Z_BOTTOM - BALL_RADIUS)
    )
    s = jnp.sign(r_old[..., 0])  # +1 when approaching from the +x side
    x_c = s * x_contact
    crossed = (
        (jnp.abs(r_old[..., 0]) >= x_contact)
        & ((r_new[..., 0] - x_c) * s < 0)
        & (v_new[..., 0] * s < 0)
    )
    hit = crossed & in_net_region

    normal = s[..., None] * jnp.array([1.0, 0.0, 0.0])
    v_b, w_b = _bounce_impulse(v_new, w_new, normal, E_NET, FRICTION_MU, FRIC_DECAY)
    x_ref = x_c - E_NET * (r_new[..., 0] - x_c)
    r_b = jnp.concatenate([x_ref[..., None], r_new[..., 1:]], axis=-1)

    hit_e = hit[..., None]
    return BallState(
        jnp.where(hit_e, r_b, r_new),
        jnp.where(hit_e, v_b, v_new),
        jnp.where(hit_e, w_b, w_new),
    ), hit


def step(state: BallState, dt: float = DT) -> BallState:
    """One physics step: implicit flight + event-based contacts."""
    r, v, w = state
    v1, w1 = _implicit_velocity_update(v, w, dt)
    r1 = r + dt * v1
    new = BallState(r1, v1, w1)

    on_table = (jnp.abs(new.r[..., 0]) < TABLE_LENGTH / 2) & (
        jnp.abs(new.r[..., 1]) < TABLE_WIDTH / 2
    )
    new, _ = _handle_plane_bounce(r, new, CONTACT_Z_TABLE, on_table, E_TABLE)
    new, _ = _handle_table_side_bounce(r, new)
    new, _ = _handle_plane_bounce(
        r, new, CONTACT_Z_GROUND, jnp.ones_like(on_table),
        _ground_restitution(new.v, new.w), mu=GROUND_MU,
        fric_decay=GROUND_FRIC_DECAY,
    )
    new, _ = _handle_net_bounce(r, new)
    return new


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
