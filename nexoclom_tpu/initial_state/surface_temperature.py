"""Analytic Mercury surface-temperature model.

Parity with ``nexoclom/initial_state/surface_temperature.py``:

    T(lon, lat) = t0 + t1 |cos(lon) cos(lat)|^n   on the dayside
                  t0                              on the nightside

with t0 = 100 K, n = 0.25, and the TAA-dependent subsolar amplitude
t1 = 600 + 125 (cos(TAA) - 1)/2.  Longitude is measured from the subsolar
point; the dayside mask is lon <= pi/2 or lon >= 3 pi/2.

Implemented with jnp so it runs both host-side (table construction) and
inside jitted kernels (temperature-dependent sticking at impact points).
"""
from __future__ import annotations

import numpy as np


def subsolar_amplitude(taa, t1=None, xp=np):
    """TAA-dependent dayside temperature amplitude t1 (K)."""
    if t1 is not None:
        return t1
    return 600.0 + 125.0 * (xp.cos(taa) - 1.0) / 2.0


# the model's calibration anchor: t1 = 600 K at Mercury's perihelion
# distance a(1 - e) = 0.3075 AU; its own TAA modulation tracks equilibrium
# (T proportional to r^-1/2) within 2.5% over Mercury's orbit
_CALIBRATION_AU = 0.3075


def moon_dayside_amplitude(aplanet_au: float) -> float:
    """Dayside amplitude t1 (K) for a body at heliocentric distance
    ``aplanet_au``: the Mercury-calibrated amplitude rescaled by the
    equilibrium law T ~ r^-1/2 (quirk F21 — applying the raw Mercury
    amplitude at Jupiter would run Io's dayside ~2.5x too hot; the
    PLANET path deliberately keeps the unscaled reference model for
    parity)."""
    return 600.0 * (_CALIBRATION_AU / float(aplanet_au)) ** 0.5


def surface_temperature(longitude, latitude, taa,
                        t0: float = 100.0, t1=None, n: float = 0.25,
                        xp=np):
    """Surface temperature (K) at model longitude/latitude (radians).

    ``xp`` selects the array namespace (numpy for host code, jax.numpy in
    kernels); the expression is branch-free so it jits cleanly (``taa`` may
    be a traced scalar).
    """
    t1 = subsolar_amplitude(taa, t1, xp=xp)
    longitude = xp.asarray(longitude)
    latitude = xp.asarray(latitude)
    dayside = (longitude <= xp.pi / 2) | (longitude >= 3 * xp.pi / 2)
    heating = t1 * xp.abs(xp.cos(longitude) * xp.cos(latitude)) ** n
    return t0 + xp.where(dayside, heating, 0.0)
