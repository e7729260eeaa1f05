"""Generate the vendored MESSENGER-like orbit fixture
(tests/data/orbits/messenger_like_orbit.csv).

Realistic viewing geometry in the sense that matters for LOS radiative
transfer (the reference's system tests consume real MESSENGER UVVS orbits,
which are not redistributable): a highly eccentric near-polar orbit around
Mercury — periapsis altitude 200 km at high northern latitude, apoapsis
15,200 km, i = 82.5 deg (MESSENGER's primary-mission shape) — with
UVVS-style limb-scan boresights sweeping tangent altitudes of 100–3000 km
on the dayside.  Columns match SpacecraftData's contract: spacecraft
position (x, y, z, R_M, model frame: sun at -y), boresight unit vector,
tangent altitude (km), plus synthetic 'measured' radiance (exponential in
tangent altitude, 350 km scale height, 5% noise) and sigma.

Deterministic (seeded); re-running reproduces the file.
"""
import os

import numpy as np
import pandas as pd

R_M = 2440.53           # km
PERI_ALT = 200.0        # km
APO_ALT = 15200.0       # km
INCL = np.radians(82.5)
ARGP = np.radians(60.0)         # periapsis at high northern latitude
RAAN = np.radians(350.0)        # near the noon-midnight plane
N_SPECTRA = 96


def orbit_positions(nu):
    """Keplerian position (R_M) for true anomalies nu."""
    rp = 1.0 + PERI_ALT / R_M
    ra = 1.0 + APO_ALT / R_M
    a = 0.5 * (rp + ra)
    e = (ra - rp) / (ra + rp)
    r = a * (1 - e ** 2) / (1 + e * np.cos(nu))
    # perifocal -> model frame (sun at -y): rotate by argp, incl, raan
    xp, yp = r * np.cos(nu), r * np.sin(nu)
    cO, sO = np.cos(RAAN), np.sin(RAAN)
    ci, si = np.cos(INCL), np.sin(INCL)
    cw, sw = np.cos(ARGP), np.sin(ARGP)
    x = (cO * cw - sO * sw * ci) * xp + (-cO * sw - sO * cw * ci) * yp
    y = (sO * cw + cO * sw * ci) * xp + (-sO * sw + cO * cw * ci) * yp
    z = (sw * si) * xp + (cw * si) * yp
    return np.stack([x, y, z], axis=1)


def main():
    rng = np.random.default_rng(3576)
    # sample more densely near periapsis (equal-ish time steps would; use
    # a simple cos-clustered grid)
    u = np.linspace(-1.0, 1.0, N_SPECTRA)
    nu = np.pi * np.sign(u) * np.abs(u) ** 1.6
    sc = orbit_positions(nu)

    # UVVS-style limb scans: boresight toward a dayside target point at a
    # cycling tangent altitude
    alt_cycle_km = np.tile(np.array([100., 300., 500., 700., 1000., 1500.,
                                     2000., 3000.]), N_SPECTRA // 8)
    sun = np.array([0.0, -1.0, 0.0])
    rows = []
    for pos, h_t in zip(sc, alt_cycle_km):
        s_hat = pos / np.linalg.norm(pos)
        w = sun - np.dot(sun, s_hat) * s_hat      # dayside, perp to radius
        if np.linalg.norm(w) < 1e-9:
            w = np.array([1.0, 0.0, 0.0])
        u_hat = w / np.linalg.norm(w)
        target = (1.0 + h_t / R_M) * u_hat
        bore = target - pos
        bore /= np.linalg.norm(bore)
        # exact tangent altitude of this ray (closest approach to center)
        t_close = -np.dot(pos, bore)
        closest = pos + t_close * bore
        alttan_km = (np.linalg.norm(closest) - 1.0) * R_M
        radiance = 50.0 * np.exp(-max(alttan_km, 0.0) / 350.0) + 0.05
        radiance *= 1.0 + 0.05 * rng.standard_normal()
        rows.append({'x': pos[0], 'y': pos[1], 'z': pos[2],
                     'xbore': bore[0], 'ybore': bore[1], 'zbore': bore[2],
                     'alttan': alttan_km,
                     'radiance': max(radiance, 1e-3),
                     'sigma': max(0.05 * radiance, 1e-3)})
    df = pd.DataFrame(rows)
    here = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(here, '..', 'tests', 'data', 'orbits')
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, 'messenger_like_orbit.csv')
    df.to_csv(path, index=False)
    print(f'wrote {len(df)} spectra to {path}')


if __name__ == '__main__':
    main()
