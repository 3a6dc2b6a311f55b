"""Rigid 3-point water: analytic SETTLE constraints, in-graph.

The reference's solvent runs flexible water at 1 fs (AMOEBA via Tinker;
our MM engine's TIP3P uses stiff springs, ROADMAP round 1).  Rigid water
removes the fastest degrees of freedom (O-H stretches, ~3600 cm^-1) and
allows 2 fs solvent stepping — roughly halving solvated wall-clock per ns.

Implements the Miyamoto-Kollman SETTLE algorithm (J Comput Chem 13:952,
1992): the exact closed-form solution of the three holonomic constraints of
a rigid triatomic, vectorized over all waters inside the jitted step.
Velocities get the exact RATTLE projection (a batched 3x3 linear solve for
the bond-direction impulses).  A fixed-iteration SHAKE reference
implementation lives here too — the tests validate SETTLE against it to
1e-5 A (both solve the same Lagrange system; SHAKE iteratively, SETTLE in
closed form).

Geometry defaults are TIP3P: r(OH) = 0.9572 A, theta(HOH) = 104.52 deg.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SettleConstraint:
    """Constraint tables for W rigid waters inside an N-atom system."""

    o_idx: Any          # [W] int32
    h1_idx: Any         # [W]
    h2_idx: Any         # [W]
    m_o: Any            # scalar (amu)
    m_h: Any
    ra: Any             # canonical geometry: O at (0, ra, 0)
    rb: Any             # H at (-+rc, -rb, 0)
    rc: Any
    d_oh: Any           # constraint distances
    d_hh: Any

    @classmethod
    def build(
        cls,
        o_idx: np.ndarray,
        h1_idx: np.ndarray,
        h2_idx: np.ndarray,
        m_o: float = 15.9994,
        m_h: float = 1.008,
        r_oh: float = 0.9572,
        theta_deg: float = 104.52,
    ) -> "SettleConstraint":
        th = math.radians(theta_deg)
        rc = r_oh * math.sin(th / 2.0)           # half H-H distance
        t = r_oh * math.cos(th / 2.0)            # O to H-H line distance
        M = m_o + 2.0 * m_h
        ra = 2.0 * m_h * t / M                   # COM to O
        rb = t - ra                              # COM to H-H line
        d_hh = 2.0 * rc
        i32 = lambda a: jnp.asarray(a, jnp.int32)
        return cls(
            o_idx=i32(o_idx), h1_idx=i32(h1_idx), h2_idx=i32(h2_idx),
            m_o=m_o, m_h=m_h, ra=ra, rb=rb, rc=rc, d_oh=r_oh, d_hh=d_hh,
        )

    @classmethod
    def from_topology(cls, top) -> "SettleConstraint | None":
        """Build from a SystemTopology's water molecules (O followed by its
        two H in the bond table)."""
        if len(top.water_oxygens) == 0:
            return None
        h_of: dict[int, list[int]] = {int(o): [] for o in top.water_oxygens}
        oset = set(int(o) for o in top.water_oxygens)
        for i, j in top.bonds:
            i, j = int(i), int(j)
            if i in oset and j not in oset:
                h_of[i].append(j)
            elif j in oset and i not in oset:
                h_of[j].append(i)
        o_idx, h1, h2 = [], [], []
        for o in sorted(oset):
            hs = sorted(h_of[o])
            if len(hs) != 2:
                continue
            o_idx.append(o)
            h1.append(hs[0])
            h2.append(hs[1])
        if not o_idx:
            return None
        return cls.build(np.array(o_idx), np.array(h1), np.array(h2))

    # ------------------------------------------------------------------
    def gather(self, X):
        return X[self.o_idx], X[self.h1_idx], X[self.h2_idx]

    def scatter(self, X, a, b, c):
        X = X.at[self.o_idx].set(a)
        X = X.at[self.h1_idx].set(b)
        return X.at[self.h2_idx].set(c)

    # ------------------------------------------------------------------
    def positions(self, X_old: jnp.ndarray, X_new: jnp.ndarray) -> jnp.ndarray:
        """SETTLE: project each water's new positions onto the rigid
        geometry, given old positions that satisfy the constraints."""
        a0, b0, c0 = self.gather(X_old)
        a1, b1, c1 = self.gather(X_new)
        a3, b3, c3 = _settle_triads(
            a0, b0, c0, a1, b1, c1,
            self.m_o, self.m_h, self.ra, self.rb, self.rc,
        )
        return self.scatter(X_new, a3, b3, c3)

    def velocities(self, X: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
        """Exact RATTLE velocity projection: after this, d/dt of every
        constraint is zero.  X must satisfy the position constraints."""
        a, b, c = self.gather(X)
        va, vb, vc = self.gather(V)
        e1 = _unit(b - a)      # O-H1
        e2 = _unit(c - a)      # O-H2
        e3 = _unit(c - b)      # H1-H2
        io, ih = 1.0 / self.m_o, 1.0 / self.m_h

        def dot(u, v):
            return jnp.sum(u * v, axis=-1)

        # unknown impulses g1 (along e1, pair a-b), g2 (e2, a-c), g3 (e3, b-c)
        # va' = va + (g1 e1 + g2 e2) io ; vb' = vb + (-g1 e1 + g3 e3) ih ; ...
        A11 = (io + ih) * 1.0
        A = jnp.stack([
            jnp.stack([
                (io + ih) * jnp.ones_like(dot(e1, e2)),
                io * dot(e1, e2),
                -ih * dot(e1, e3),
            ], -1),
            jnp.stack([
                io * dot(e1, e2),
                (io + ih) * jnp.ones_like(dot(e1, e2)),
                ih * dot(e2, e3),
            ], -1),
            jnp.stack([
                -ih * dot(e1, e3),
                ih * dot(e2, e3),
                2.0 * ih * jnp.ones_like(dot(e1, e2)),
            ], -1),
        ], -2)                                           # [W,3,3]
        del A11
        rhs = jnp.stack([
            dot(e1, va - vb), dot(e2, va - vc), dot(e3, vb - vc)
        ], -1)                                           # [W,3]
        g = jnp.linalg.solve(A, rhs[..., None])[..., 0]  # [W,3]
        g1, g2, g3 = g[:, 0:1], g[:, 1:2], g[:, 2:3]
        va = va - (g1 * e1 + g2 * e2) * io
        vb = vb - (-g1 * e1 + g3 * e3) * ih
        vc = vc - (-g2 * e2 - g3 * e3) * ih
        return self.scatter(V, va, vb, vc)

    def snap(self, X: jnp.ndarray) -> jnp.ndarray:
        """Project arbitrary water geometries onto the rigid constraints
        (one-time initialization: pre-equilibrated flexible-water inputs
        only approximately satisfy them).  Reuses the SETTLE construction
        with the current positions as the orientation reference."""
        return self.positions(X, X)

    # ------------------------------------------------------------------
    def max_violation(self, X) -> jnp.ndarray:
        a, b, c = self.gather(X)
        return jnp.max(jnp.stack([
            jnp.abs(_norm(b - a) - self.d_oh),
            jnp.abs(_norm(c - a) - self.d_oh),
            jnp.abs(_norm(c - b) - self.d_hh),
        ]))


def _norm(v):
    return jnp.sqrt(jnp.sum(v * v, axis=-1))


def _unit(v):
    return v / _norm(v)[..., None]


def _settle_triads(a0, b0, c0, a1, b1, c1, ma, mh, ra, rb, rc):
    """Vectorized Miyamoto-Kollman closed form over [W,3] triads."""
    M = ma + 2.0 * mh
    com = (ma * a1 + mh * (b1 + c1)) / M
    a1 = a1 - com
    b1 = b1 - com
    c1 = c1 - com
    b0a = b0 - a0
    c0a = c0 - a0

    # orthonormal frame: z along the old plane normal, x  |_ (a1, z)
    n0 = jnp.cross(b0a, c0a)
    n1 = jnp.cross(a1, n0)
    n2 = jnp.cross(n0, n1)
    n0, n1, n2 = _unit(n0), _unit(n1), _unit(n2)

    def fr(v):  # lab -> frame (x, y, z)
        return (
            jnp.sum(v * n1, -1), jnp.sum(v * n2, -1), jnp.sum(v * n0, -1)
        )

    xb0, yb0, _ = fr(b0a)
    xc0, yc0, _ = fr(c0a)
    _, _, za1 = fr(a1)
    xb1, yb1, zb1 = fr(b1)
    xc1, yc1, zc1 = fr(c1)

    sinphi = jnp.clip(za1 / ra, -1.0, 1.0)
    cosphi = jnp.sqrt(1.0 - sinphi * sinphi)
    sinpsi = jnp.clip((zb1 - zc1) / (2.0 * rc * cosphi), -1.0, 1.0)
    cospsi = jnp.sqrt(1.0 - sinpsi * sinpsi)

    ya2 = ra * cosphi
    xb2 = -rc * cospsi
    yb2 = -rb * cosphi - rc * sinpsi * sinphi
    yc2 = -rb * cosphi + rc * sinpsi * sinphi

    alpha = xb2 * (xb0 - xc0) + yb0 * yb2 + yc0 * yc2
    beta = xb2 * (yc0 - yb0) + xb0 * yb2 + xc0 * yc2
    gamma = xb0 * yb1 - xb1 * yb0 + xc0 * yc1 - xc1 * yc0

    a2b2 = alpha * alpha + beta * beta
    sintheta = (
        alpha * gamma - beta * jnp.sqrt(jnp.maximum(a2b2 - gamma * gamma, 0.0))
    ) / a2b2
    sintheta = jnp.clip(sintheta, -1.0, 1.0)
    costheta = jnp.sqrt(1.0 - sintheta * sintheta)

    xa3 = -ya2 * sintheta
    ya3 = ya2 * costheta
    za3 = za1
    xb3 = xb2 * costheta - yb2 * sintheta
    yb3 = xb2 * sintheta + yb2 * costheta
    zb3 = -rb * sinphi + rc * sinpsi * cosphi
    xc3 = -xb2 * costheta - yc2 * sintheta
    yc3 = -xb2 * sintheta + yc2 * costheta
    zc3 = -rb * sinphi - rc * sinpsi * cosphi

    def lab(x, y, z):
        return x[..., None] * n1 + y[..., None] * n2 + z[..., None] * n0 + com

    return lab(xa3, ya3, za3), lab(xb3, yb3, zb3), lab(xc3, yc3, zc3)


def shake_reference(con: SettleConstraint, X_old, X_new, masses,
                    n_iter: int = 200):
    """Iterative SHAKE on the water constraints (test oracle for SETTLE;
    converges to the same Lagrange solution)."""
    pairs = [
        (con.o_idx, con.h1_idx, con.d_oh),
        (con.o_idx, con.h2_idx, con.d_oh),
        (con.h1_idx, con.h2_idx, con.d_hh),
    ]
    m = jnp.asarray(masses)[:, None]
    ref = {}
    for k, (i, j, d) in enumerate(pairs):
        ref[k] = X_old[i] - X_old[j]

    def body(_, X):
        for k, (i, j, d) in enumerate(pairs):
            r = X[i] - X[j]
            r0 = ref[k]
            diff = jnp.sum(r * r, -1) - d * d
            # SHAKE multiplier against the reference direction
            g = diff / (2.0 * jnp.sum(r * r0, -1) * (1.0 / m[i, 0] + 1.0 / m[j, 0]))
            X = X.at[i].add(-g[:, None] * r0 / m[i])
            X = X.at[j].add(g[:, None] * r0 / m[j])
        return X

    return jax.lax.fori_loop(0, n_iter, body, X_new)
