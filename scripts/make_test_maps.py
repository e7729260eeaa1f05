"""Generate the vendored test map files in tests/data/{surface,sticking}_maps.

These mirror the SHAPE of the reference's real test maps
(/root/reference/tests/test_data/surface_maps/Orbit3576.Ca.pkl and
sticking_maps/Orbit3576_Ca_smooth.pkl) with synthetic, analytically-defined
content:

  * bin-EDGE grids: longitude (73,) over [0, 2pi], latitude (37,) over
    [-pi/2, pi/2], with bin-valued (72, 36) abundance — one point fewer per
    axis than the grids, the off-by-one the reference absorbs through its
    R5 uniform-axis regridding (randomdeviates.py:58-59)
  * extra fields (velocity, vdist, p_available, v_available) that SourceMap
    must ignore, as the reference's SourceMap does
  * sticking-map abundances far above 1 (the real file spans 2.9..51),
    exercising the normalise-to-max interpretation
  * a planet-fixed variant for the rotation path

Deterministic: re-running reproduces byte-identical arrays (protocol-level
pickle bytes may differ across Python versions; content is what is tested).
"""
import os
import pickle

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, '..', 'tests', 'data')


def edge_grids():
    lon_edges = np.linspace(0.0, 2 * np.pi, 73)
    lat_edges = np.linspace(-np.pi / 2, np.pi / 2, 37)
    # bin-center axes the R5 convention will reconstruct
    lon_c = np.linspace(0.0, 2 * np.pi, 72)
    lat_c = np.linspace(-np.pi / 2, np.pi / 2, 36)
    return lon_edges, lat_edges, lon_c, lat_c


def extras():
    velocity = np.linspace(0.0, 8.0, 101)
    vdist = np.exp(-((velocity[:-1] - 2.0) / 1.5) ** 2)
    return {'velocity': velocity, 'vdist': vdist / vdist.max(),
            'v_available': np.ones(100),
            'p_available': np.zeros((72, 36))}


def main():
    lon_edges, lat_edges, lon_c, lat_c = edge_grids()

    # surface (spatial source) map: dawn-side enhancement, equator-peaked
    dawn = np.exp(np.cos(lon_c[:, None] - 4.712))    # peak at dawn terminator
    eq = np.cos(lat_c[None, :]) ** 2
    abundance = 88.7 * (dawn * eq) / (dawn * eq).max()

    os.makedirs(os.path.join(DATA, 'surface_maps'), exist_ok=True)
    os.makedirs(os.path.join(DATA, 'sticking_maps'), exist_ok=True)

    with open(os.path.join(DATA, 'surface_maps', 'orbit_ca_analog.pkl'),
              'wb') as f:
        pickle.dump({'longitude': lon_edges, 'latitude': lat_edges,
                     'abundance': abundance,
                     'coordinate_system': 'solar-fixed', **extras()}, f)

    with open(os.path.join(DATA, 'surface_maps',
                           'orbit_ca_planetfixed.pkl'), 'wb') as f:
        pickle.dump({'longitude': lon_edges, 'latitude': lat_edges,
                     'abundance': abundance,
                     'coordinate_system': 'planet-fixed', **extras()}, f)

    # sticking map: abundance-style values (2.9..51.4 like the real file),
    # day-side low sticking / night-side high (peak at lon = pi)
    stick = 2.9 + (51.4 - 2.9) * 0.5 * (1 + np.cos(lon_c[:, None] - np.pi)) \
        * np.ones((1, lat_c.size))
    with open(os.path.join(DATA, 'sticking_maps',
                           'orbit_ca_sticking.pkl'), 'wb') as f:
        pickle.dump({'longitude': lon_edges, 'latitude': lat_edges,
                     'abundance': stick,
                     'coordinate_system': 'solar-fixed', **extras()}, f)

    # plasma-torus loss profile (quirk F23): Io-torus analog — radial
    # profile peaked at Io's orbit (5.9 R_J), vertical Gaussian with the
    # canonical ~0.9 R_J scale height, tapered to 0 at both edges so the
    # np.interp end clamping vanishes outside
    os.makedirs(os.path.join(DATA, 'loss_profiles'), exist_ok=True)
    rho = np.linspace(0.0, 12.0, 121)
    rate = 5e-4 * np.exp(-((rho - 5.9) / 1.2) ** 2)
    rate[rho < 3.5] = 0.0
    rate[rho > 10.0] = 0.0
    z = np.linspace(-4.0, 4.0, 81)
    rate_z = np.exp(-(z / 0.9) ** 2)
    rate_z[np.abs(z) > 3.5] = 0.0
    with open(os.path.join(DATA, 'loss_profiles', 'io_torus.pkl'),
              'wb') as f:
        pickle.dump({'rho': rho, 'rate': rate, 'z': z, 'rate_z': rate_z}, f)

    print('wrote 4 fixtures under tests/data/')


if __name__ == '__main__':
    main()
