"""Filter state manifold as a JAX pytree.

State layout (mirrors use-ikfom.hpp:14-27, generalized to runtime L = number
of LiDARs; DOF n = 17 + 6L, e.g. n=35 for L=3):

  block    tangent rows     storage
  pos      [0, 3)           (3,)  world position of IMU
  rot      [3, 6)           (4,)  quaternion [w,x,y,z], IMU->world
  ext_r[l] [6+3l, 9+3l)     (L,4) per-LiDAR extrinsic rotation (LiDAR->IMU)
  ext_t[l] [6+3L+3l, ...)   (L,3) per-LiDAR extrinsic translation
  vel      [6+6L, 9+6L)     (3,)  world velocity
  bg       [9+6L, 12+6L)    (3,)  gyro bias
  ba       [12+6L, 15+6L)   (3,)  accel bias
  grav     [15+6L, 17+6L)   (3,)  gravity on S2 sphere, radius 9.809 (2 DOF)

Design divergence from the reference: L is a *configuration* value (static
per jit trace) instead of a compile-time template parameter that requires
editing five code sites (reference README.md:60-176). Extrinsic slots are
keyed to physical LiDAR index, never permuted on arrival-order changes —
this makes esekfom.hpp:810-861 (change_ext, which drops ext_t cross
covariances) unnecessary and strictly preserves more information.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .geometry import so3, s2

S2_LENGTH = s2.DEFAULT_LENGTH  # 9.809, use-ikfom.hpp:8
GRAVITY = 9.81  # common_lib.h:20


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    pos: Any  # (3,)
    rot: Any  # (4,) [w,x,y,z]
    ext_r: Any  # (L, 4)
    ext_t: Any  # (L, 3)
    vel: Any  # (3,)
    bg: Any  # (3,)
    ba: Any  # (3,)
    grav: Any  # (3,) |grav| == S2_LENGTH

    @property
    def num_lidars(self) -> int:
        return self.ext_r.shape[0]

    @property
    def dof(self) -> int:
        return 17 + 6 * self.num_lidars


def identity_state(num_lidars: int, dtype=jnp.float32) -> State:
    quat_id = jnp.zeros((4,), dtype).at[0].set(1.0)
    return State(
        pos=jnp.zeros(3, dtype),
        rot=quat_id,
        ext_r=jnp.tile(quat_id, (num_lidars, 1)),
        ext_t=jnp.zeros((num_lidars, 3), dtype),
        vel=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        grav=jnp.zeros(3, dtype).at[2].set(-S2_LENGTH),
    )


# ---------------------------------------------------------------------------
# tangent-space index helpers (all python ints — static under jit)
# ---------------------------------------------------------------------------

def idx_pos(L):  # noqa: D103
    return 0


def idx_rot(L):
    return 3


def idx_ext_r(L, l):
    return 6 + 3 * l


def idx_ext_t(L, l):
    return 6 + 3 * L + 3 * l


def idx_vel(L):
    return 6 + 6 * L


def idx_bg(L):
    return 9 + 6 * L


def idx_ba(L):
    return 12 + 6 * L


def idx_grav(L):
    return 15 + 6 * L


def dof(L):
    return 17 + 6 * L


def so3_block_starts(L):
    """Tangent start indices of every SO(3) sub-state (rot + extrinsics)."""
    return [idx_rot(L)] + [idx_ext_r(L, l) for l in range(L)]


# ---------------------------------------------------------------------------
# manifold operations
# ---------------------------------------------------------------------------

def boxplus(x: State, dx) -> State:
    """x ⊞ dx with dx a (n,) tangent vector (MTK_BUILD_MANIFOLD boxplus)."""
    L = x.num_lidars
    dx = dx.astype(x.pos.dtype)
    d_ext_r = dx[6 : 6 + 3 * L].reshape(L, 3)
    d_ext_t = dx[6 + 3 * L : 6 + 6 * L].reshape(L, 3)
    o = 6 + 6 * L
    return State(
        pos=x.pos + dx[0:3],
        rot=so3.boxplus(x.rot, dx[3:6]),
        ext_r=jax.vmap(so3.boxplus)(x.ext_r, d_ext_r),
        ext_t=x.ext_t + d_ext_t,
        vel=x.vel + dx[o : o + 3],
        bg=x.bg + dx[o + 3 : o + 6],
        ba=x.ba + dx[o + 6 : o + 9],
        grav=s2.s2_boxplus(x.grav, dx[o + 9 : o + 11]),
    )


def boxminus(x1: State, x2: State):
    """(n,) tangent vector x1 ⊟ x2."""
    L = x1.num_lidars
    return jnp.concatenate(
        [
            x1.pos - x2.pos,
            so3.boxminus(x1.rot, x2.rot),
            jax.vmap(so3.boxminus)(x1.ext_r, x2.ext_r).reshape(-1),
            (x1.ext_t - x2.ext_t).reshape(-1),
            x1.vel - x2.vel,
            x1.bg - x2.bg,
            x1.ba - x2.ba,
            s2.s2_boxminus(x1.grav, x2.grav),
        ]
    )


def oplus(x: State, f, dt) -> State:
    """Euler integration step x ⊕ (f * dt) where f is the (m,) flattened
    process derivative (m = 18+6L; grav rows are 3-dim but identically 0).

    Only pos, rot, vel rows of f are nonzero for this system
    (use-ikfom.hpp:67-80), so extrinsics/biases/gravity pass through."""
    return State(
        pos=x.pos + f[0:3] * dt,
        rot=so3.boxplus(x.rot, f[3:6] * dt),
        ext_r=x.ext_r,
        ext_t=x.ext_t,
        vel=x.vel + f[6 + 6 * x.num_lidars : 9 + 6 * x.num_lidars] * dt,
        bg=x.bg,
        ba=x.ba,
        grav=x.grav,
    )
