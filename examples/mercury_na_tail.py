"""Mercury's sodium tail — the reference's flagship science case.

A dayside Na source under gravity + radiation pressure: solar photon
pressure on the D lines pushes escaping atoms anti-sunward into the tail.
Runs the full product chain (input file -> Output -> ModelImage) and saves
a PNG + JSON export, then reports the tail/sunward radiance asymmetry.

    python examples/mercury_na_tail.py [--packets 20000] [--tpu]
        [--savepath /tmp/nexoclom_tpu_examples]
"""
import argparse
import os
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

INPUTFILE = textwrap.dedent("""\
    geometry.planet = Mercury
    geometry.taa = 1.3

    spatialdist.type = uniform
    spatialdist.longitude = 1.5708, 4.7124

    speeddist.type = gaussian
    speeddist.vprob = 2.4
    speeddist.sigma = 0.5

    angulardist.type = radial

    surfaceinteraction.stickcoef = 1.

    options.endtime = 28800.
    options.species = Na
    options.step_size = 30.
    options.outeredge = 30.
""")


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

    infile = os.path.join(args.savepath, 'mercury_na_tail.input')
    with open(infile, 'w') as f:
        f.write(INPUTFILE)
    inp = nexoclom_tpu.Input(infile)
    inp.run(args.packets, seed=1, sharded=args.sharded)

    # observer over the dusk equator (the default latitude pi/2 is a
    # pole-on view): the sky plane then contains the sun line, so the
    # anti-sunward tail extends across the image
    image = inp.produce_image({'quantity': 'radiance', 'origin': 'Mercury',
                               'dims': '400,200', 'width': '24,12',
                               'subobslongitude': '1.5708',
                               'subobslatitude': '0'})
    png = os.path.join(args.savepath, 'mercury_na_tail.png')
    image.export(os.path.join(args.savepath, 'mercury_na_tail.json'))
    image.display(savefile=png, show=False)
    print(f'image: {png}')

    img = np.asarray(image.image)
    x = np.asarray(image.xaxis)
    # the rotation to this vantage maps the anti-sunward +y axis onto
    # POSITIVE sky-plane x (verified empirically): the tail is at x > 0
    tail = img[x > 2.0].sum()
    sunward = img[x < -2.0].sum()
    ratio = (f'{tail / sunward:.1f}x' if sunward > 0
             else 'all of it (no sunward signal)')
    print(f'radiance beyond 2 R_M: sunward {sunward:.3e}, anti-sunward '
          f'{tail:.3e} -> tail asymmetry {ratio}')
    assert tail > 3 * sunward, 'expected a pronounced anti-sunward tail'
    print('OK')


if __name__ == '__main__':
    main()
