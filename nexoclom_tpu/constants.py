"""Physical constants and unit conversion factors.

The reference implementation (nexoclom) threads astropy quantities through all
host-side code and strips units at the numpy boundary.  This build instead uses
a fixed internal unit policy with explicit conversion factors, so that nothing
unit-aware ever reaches a jitted function:

* Host-side "physical" units: km, km/s, s, K, AU, kg.
* Engine ("model") units: planetary radii (R_p), seconds, R_p/s.
  These match the reference engine's internal units
  (``nexoclom/particle_tracking/Output.py:102-128``).

All values are CODATA 2018 / IAU 2012 exact or recommended values.
"""

# CODATA 2018 exact values
GRAVITATIONAL_CONSTANT = 6.67430e-11      # m^3 kg^-1 s^-2
BOLTZMANN_CONSTANT = 1.380649e-23         # J / K (exact)
PLANCK_CONSTANT = 6.62607015e-34          # J s (exact)
SPEED_OF_LIGHT = 2.99792458e8             # m / s (exact)
ATOMIC_MASS_UNIT = 1.66053906660e-27      # kg
ELECTRON_VOLT = 1.602176634e-19           # J (exact)

# IAU 2012 exact definition
ASTRONOMICAL_UNIT_M = 1.495978707e11      # m
ASTRONOMICAL_UNIT_KM = 1.495978707e8      # km

KM = 1.0e3                                # m
CM_PER_KM = 1.0e5
SECONDS_PER_DAY = 86400.0
SECONDS_PER_HOUR = 3600.0


def thermal_speed_kms(temperature_k: float, mass_amu: float) -> float:
    """Most-probable (thermal) speed sqrt(2 k T / m) in km/s.

    Mirrors the v_th used by the reference Maxwellian sampler
    (``source_distribution.py:158-159``).
    """
    m_kg = mass_amu * ATOMIC_MASS_UNIT
    v_ms = (2.0 * BOLTZMANN_CONSTANT * temperature_k / m_kg) ** 0.5
    return v_ms / KM


def binding_speed_kms(energy_ev: float, mass_amu: float) -> float:
    """Surface binding speed sqrt(2 U / m) in km/s for sputtering distributions
    (``math/distributions.py:7-13`` in the reference)."""
    m_kg = mass_amu * ATOMIC_MASS_UNIT
    v_ms = (2.0 * energy_ev * ELECTRON_VOLT / m_kg) ** 0.5
    return v_ms / KM


# Full width of the true-anomaly-angle run-matching window (radians);
# matches the reference search tolerance (input_classes.py:16).
TAA_MATCH_WIDTH = 0.017453292519943295  # radians(1.0)
