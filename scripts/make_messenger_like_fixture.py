"""Generate the MESSENGER-like orbit fixture (tests/data/spacecraft/).

The reference's system test drives real MESSENGER UVVS spectra through
``MESSENGERdata.model()`` (tests/system_tests/test_run_through.py); the
UVVS dataset itself is an external package this image cannot carry.  This
script builds a REALISTIC stand-in with the actual MESSENGER orbit and
UVVS-style limb scans, so the system test exercises the viewing geometry
the instrument really had instead of a toy circle:

* Orbit: MESSENGER's primary science orbit around Mercury — 200 x
  15,193 km altitude (a = 4.153 R_M, e = 0.740), 82.5 deg inclination,
  periapsis at 60 deg N — Kepler-propagated over one 12-hour orbit.
* Pointing: limb scans.  Each spectrum's boresight is tangent to a shell
  at altitudes stepping through the UVVS-like ladder 50..3200 km, tilted
  toward the dayside (the model frame has the Sun at -y).
* Radiance: a plausible exospheric decline with tangent altitude
  (e-folding 500 km) with 5% noise — the system test fits the source
  rate against it and checks the MODEL's physical trends, so only the
  geometry needs to be realistic, not the values.

Deterministic (fixed seed); run from the repo root to refresh:

    python scripts/make_messenger_like_fixture.py
"""
import os

import numpy as np
import pandas as pd

R_M_KM = 2440.53
ALT_PERI_KM = 200.0
ALT_APO_KM = 15193.0
INCLINATION = np.radians(82.5)
ARG_PERIAPSIS = np.radians(119.0)   # puts periapsis near 60 deg N
RAAN = np.radians(10.0)
N_SPECTRA = 320
ALT_LADDER_KM = (50.0, 100.0, 200.0, 400.0, 800.0, 1600.0, 3200.0)


def kepler_positions(n):
    """Spacecraft positions (R_M, model frame) over one anomalistic orbit,
    sampled uniformly in mean anomaly (time)."""
    r_p = 1.0 + ALT_PERI_KM / R_M_KM
    r_a = 1.0 + ALT_APO_KM / R_M_KM
    a = 0.5 * (r_p + r_a)
    e = (r_a - r_p) / (r_a + r_p)
    mean = np.linspace(0.0, 2.0 * np.pi, n, endpoint=False)
    ecc = mean.copy()
    for _ in range(64):
        ecc = ecc - (ecc - e * np.sin(ecc) - mean) / (1.0 - e * np.cos(ecc))
    nu = 2.0 * np.arctan2(np.sqrt(1 + e) * np.sin(ecc / 2),
                          np.sqrt(1 - e) * np.cos(ecc / 2))
    r = a * (1.0 - e * np.cos(ecc))
    # perifocal -> model frame (z = spin axis, sun at -y)
    x_pf, y_pf = r * np.cos(nu), r * np.sin(nu)
    cw, sw = np.cos(ARG_PERIAPSIS), np.sin(ARG_PERIAPSIS)
    ci, si = np.cos(INCLINATION), np.sin(INCLINATION)
    co, so = np.cos(RAAN), np.sin(RAAN)
    xw = cw * x_pf - sw * y_pf
    yw = sw * x_pf + cw * y_pf
    yi, zi = ci * yw, si * yw
    return np.stack([co * xw - so * yi, so * xw + co * yi, zi], axis=1)


def limb_boresights(sc, rng):
    """UVVS-style limb scan: for each spacecraft position, a boresight
    tangent to the shell at the next altitude in the ladder, tilted from
    nadir toward the dayside (-y).  Spectra whose tangent shell the
    spacecraft is below are dropped (no limb view)."""
    sun = np.array([0.0, -1.0, 0.0])
    rows = []
    for k, pos in enumerate(sc):
        alt = ALT_LADDER_KM[k % len(ALT_LADDER_KM)]
        rt = 1.0 + alt / R_M_KM
        d = np.linalg.norm(pos)
        if d <= rt * 1.02:          # too low for this tangent shell
            continue
        nadir = -pos / d
        # tilt axis: rotate nadir within the (nadir, sunward) plane
        axis = np.cross(nadir, sun)
        norm = np.linalg.norm(axis)
        if norm < 1e-6:             # looking along the sun line: use x
            axis = np.array([1.0, 0.0, 0.0])
        else:
            axis /= norm
        alpha = np.arcsin(rt / d)   # tangent condition sin(alpha) = rt/d
        # Rodrigues rotation of nadir by alpha about axis (toward -y)
        bore = (nadir * np.cos(alpha) + np.cross(axis, nadir) * np.sin(alpha)
                + axis * (axis @ nadir) * (1.0 - np.cos(alpha)))
        bore /= np.linalg.norm(bore)
        # exact tangent altitude of this ray (km)
        s = -(pos @ bore)
        alttan = (np.linalg.norm(pos + s * bore) - 1.0) * R_M_KM
        rows.append((*pos, *bore, alttan))
    arr = np.asarray(rows)
    radiance = 2.0 * np.exp(-arr[:, 6] / 500.0) * rng.normal(
        1.0, 0.05, len(arr))
    sigma = 0.05 * np.abs(radiance) + 0.01
    return pd.DataFrame({
        'x': arr[:, 0], 'y': arr[:, 1], 'z': arr[:, 2],
        'xbore': arr[:, 3], 'ybore': arr[:, 4], 'zbore': arr[:, 5],
        'alttan': arr[:, 6],
        'radiance': np.maximum(radiance, 0.01), 'sigma': sigma,
    })


def main():
    rng = np.random.default_rng(20260816)
    sc = kepler_positions(N_SPECTRA)
    df = limb_boresights(sc, rng)
    outdir = os.path.join(os.path.dirname(__file__), '..', 'tests', 'data',
                          'spacecraft')
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, 'messenger_like_orbit.csv')
    df.to_csv(out, index=False, float_format='%.8g')
    print(f'{out}: {len(df)} spectra, alttan {df.alttan.min():.0f}-'
          f'{df.alttan.max():.0f} km, r {np.hypot(df.x, np.hypot(df.y, df.z)).min():.2f}-'
          f'{np.hypot(df.x, np.hypot(df.y, df.z)).max():.2f} R_M')


if __name__ == '__main__':
    main()
