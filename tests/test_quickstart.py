"""Docs-rot guard: the quickstart's input file runs end to end.

Extracts the literal ``natail.input`` block from docs/quickstart.md (so the
DOC is the fixture — editing the walkthrough re-tests it), then drives the
five quickstart steps through the public API at a tiny packet count:
parse -> run -> image -> density -> data fit.
"""
import math
import os
import re

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
DOC = os.path.join(HERE, '..', 'docs', 'quickstart.md')


def _natail_block():
    text = open(DOC).read()
    blocks = re.findall(r'```text\n(.*?)```', text, re.S)
    assert blocks, 'quickstart lost its input-file block'
    block = blocks[0]
    assert 'natail.input' in block
    return block


def test_quickstart_walkthrough(tmp_path, monkeypatch):
    import nexoclom_tpu
    from nexoclom_tpu.utilities.config import NexoclomConfig, set_config

    set_config(NexoclomConfig(savepath=str(tmp_path)))
    infile = tmp_path / 'natail.input'
    infile.write_text(_natail_block())

    # step 3: run packets (tiny count; same config semantics)
    inp = nexoclom_tpu.Input(str(infile))
    assert inp.geometry.planet.object == 'Mercury'
    assert inp.options.step_size == 30.0
    inp.run(npackets=1500, seed=1)
    # incremental semantics: same arguments are a no-op (same file set)
    _, files_a, n_a, _ = inp.search()
    inp.run(npackets=1500, seed=1)
    _, files_b, n_b, _ = inp.search()
    assert files_a == files_b and n_a == n_b == 1500

    # step 4: observables
    img = inp.produce_image({'quantity': 'radiance', 'dims': '64,64',
                             'width': '30,30'})
    assert np.isfinite(img.image).all() and img.image.sum() > 0
    dens = nexoclom_tpu.ModelDensity(inp, [-2.0, -3.0], [0.0, 0.0],
                                     [0.0, 0.0], dr=0.5)
    assert np.isfinite(dens.density).all()

    # step 5: data comparison chain on the vendored orbit
    orbit = pd.read_csv(os.path.join(HERE, 'data', 'orbits',
                                     'messenger_like_orbit.csv'))
    scdata = nexoclom_tpu.SpacecraftData(orbit, species='Na')
    result = scdata.model(inp, npackets=1500, dphi=math.radians(1.0),
                          seed=1)
    assert np.isfinite(result.sourcerate) and result.sourcerate > 0

    # step 5b: the smeared source maps (tiny grid)
    srcmap, availmap = result.make_source_map(
        dict(nlonbins=18, nlatbins=9, nvelbins=10, naltbins=6, nazbins=5))
    assert srcmap.abundance.shape == (18, 9)
    assert np.isfinite(srcmap.abundance).all()
    assert availmap.abundance.sum() > 0
