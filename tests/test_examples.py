"""CI smoke tests for the examples gallery: each example's ``main()`` runs
end to end at a tiny packet count (CPU backend, temp savepath) so the
gallery cannot rot silently.  The examples' own science assertions (tail
asymmetry, torus annulus fraction, positive fitted source rate) stay
active — they are physics-strong enough to hold at small counts."""
import importlib
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), '..', 'examples')


@pytest.mark.parametrize('name, packets, extra', [
    ('mercury_na_tail', 1500, ()),
    ('io_torus', 1200, ()),
    ('messenger_fit', 1500, ()),
    # the sparse-cone production route: LOS through the block cull
    ('messenger_fit', 1500, ('--cull', '512')),
])
def test_example_runs(name, packets, extra, tmp_path, monkeypatch):
    monkeypatch.syspath_prepend(EXAMPLES_DIR)
    # examples honor NEXOCLOM_SAVEPATH via setdefault; force it to the
    # test's temp dir so nothing escapes
    monkeypatch.setenv('NEXOCLOM_SAVEPATH', str(tmp_path))
    monkeypatch.setattr(sys, 'argv', [
        f'{name}.py', '--packets', str(packets),
        '--savepath', str(tmp_path), *extra])
    module = importlib.import_module(name)
    module.main()


def test_demo_species_sweep(monkeypatch, capsys):
    """The (species x TAA) ensemble demo — the north-star sweep shape —
    runs end to end at tiny scale (the Condor-fan-out role,
    utilities/Condor.py:21-105)."""
    scripts_dir = os.path.join(os.path.dirname(__file__), '..', 'scripts')
    monkeypatch.syspath_prepend(scripts_dir)
    monkeypatch.setattr(sys, 'argv', [
        'demo_ensemble_sweep.py', '--members', '2', '--species', 'Na,Ca',
        '--packets', '512', '--nsteps', '5'])
    module = importlib.import_module('demo_ensemble_sweep')
    module.main()
    out = capsys.readouterr().out
    assert '4 members (2 species x 2 TAA)' in out
    assert 'Ca@180' in out
