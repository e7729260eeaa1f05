"""Io's sodium cloud inside the tilted, co-rotating plasma torus.

Capabilities the reference declares but cannot run (its engine refuses
satellite start points, and its electron-impact path is a stub chain):
packets launch from the moving Io — inheriting its orbital velocity,
feeling its gravity and shadow, dying on re-impact — while the plasma
torus (a rate(rho, z) field whose centrifugal equator leans 6.4 deg off
the spin axis, co-rotates at the System III period, and carries a ~20%
System III longitude modulation) erodes the cloud.  Produces the
observer-frame image of the banana cloud.

    python examples/io_torus.py [--packets 20000] [--tpu]
        [--savepath /tmp/nexoclom_tpu_examples]
"""
import argparse
import os
import pickle
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

INPUTFILE = textwrap.dedent("""\
    geometry.planet = Jupiter
    geometry.startpoint = Io
    geometry.objects = Jupiter, Io
    geometry.phi = 4.712
    geometry.taa = 0.

    spatialdist.type = uniform

    speeddist.type = gaussian
    speeddist.vprob = 3.0
    speeddist.sigma = 0.8

    angulardist.type = isotropic

    surfaceinteraction.stickcoef = 1.

    options.endtime = 36000.
    options.lifetime = -1e30
    options.species = Na
    options.step_size = 60.
    options.outeredge = 30.
    options.eimp_profile = io_torus_profile.pkl
    options.eimp_tilt = 6.4
    options.eimp_tilt_phase = 200.
    options.eimp_phi_phase = 200.
""")


def torus_profile():
    """A simple Io-torus electron-impact field: radial peak at Io's orbit
    (5.9 R_J), vertical Gaussian of scale height 1 R_J, and a ~20%
    System III longitude modulation (quirk F28)."""
    import numpy as np
    rho = np.linspace(0.0, 12.0, 49)
    rate = 2.0e-4 * np.exp(-0.5 * ((rho - 5.9) / 1.2) ** 2)
    rate[0] = rate[-1] = 0.0
    z = np.linspace(-4.0, 4.0, 33)
    rate_z = np.exp(-0.5 * (z / 1.0) ** 2)
    rate_z[0] = rate_z[-1] = 0.0
    phi = np.linspace(0.0, 2.0 * np.pi, 73)
    rate_phi = 1.0 + 0.2 * np.cos(phi)
    return {'rho': rho, 'rate': rate, 'z': z, 'rate_z': rate_z,
            'phi': phi, 'rate_phi': rate_phi}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--packets', type=int, default=20000)
    ap.add_argument('--tpu', action='store_true')
    ap.add_argument('--sharded', action='store_true',
                    help='shard the packet axis over every '
                         'local device (multi-chip run)')
    ap.add_argument('--savepath', default='/tmp/nexoclom_tpu_examples')
    args = ap.parse_args()

    os.makedirs(args.savepath, exist_ok=True)
    os.environ.setdefault('NEXOCLOM_SAVEPATH', args.savepath)
    from nexoclom_tpu.utilities.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if not args.tpu:
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    import nexoclom_tpu

    with open(os.path.join(args.savepath, 'io_torus_profile.pkl'),
              'wb') as f:
        pickle.dump(torus_profile(), f)
    infile = os.path.join(args.savepath, 'io_torus.input')
    with open(infile, 'w') as f:
        f.write(INPUTFILE)

    inp = nexoclom_tpu.Input(infile)
    inp.run(args.packets, seed=3, sharded=args.sharded)

    # pole-on view (the default): the banana cloud along Io's orbit
    image = inp.produce_image({'quantity': 'column', 'origin': 'Jupiter',
                               'dims': '300,300', 'width': '20,20'})
    png = os.path.join(args.savepath, 'io_torus.png')
    image.display(savefile=png, show=False)
    print(f'image: {png}')

    img = np.asarray(image.image)
    x, z = np.asarray(image.xaxis), np.asarray(image.zaxis)
    rr = np.hypot(x[:, None], z[None, :])
    ring = img[(rr > 4.4) & (rr < 7.4)].sum()
    total = img.sum()
    print(f'column in the 4.4-7.4 R_J annulus: {ring / total:.0%} of total '
          f'(the cloud rides Io\'s orbit at 5.9 R_J)')
    assert ring > 0.5 * total
    print('OK')


if __name__ == '__main__':
    main()
