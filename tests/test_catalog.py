"""Catalog round-trip tests (replaces the reference's DB search tests,
``test_input_search.py``): insert outputs, search with TAA tolerance,
cascade delete."""
import copy
import os

import pytest

from nexoclom_tpu.initial_state import Input
from nexoclom_tpu.utilities.catalog import get_catalog

pytestmark = pytest.mark.utilities

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')


def _inputs():
    return Input(os.path.join(INPUTFILES, 'mercury_gravity.input'))


def _insert(catalog, inputs_dict, npackets, totalsource):
    """Insert AND touch the array file: search_outputs treats records
    whose file does not exist as unfinished (crash-resume semantics)."""
    idnum, fname = catalog.insert_output(inputs_dict, npackets, totalsource)
    open(fname, 'wb').close()
    return idnum, fname


def test_search_empty():
    assert _inputs().search() == ([], [], 0, 0.0)


def test_insert_and_search():
    catalog = get_catalog()
    inp = _inputs()
    id1, f1 = _insert(catalog, inp.to_dict(), 1000, 1000.0)
    id2, f2 = _insert(catalog, inp.to_dict(), 500, 500.0)
    ids, files, npackets, totalsource = inp.search()
    assert sorted(ids) == [id1, id2]
    assert npackets == 1500 and totalsource == 1500.0
    assert all(f.endswith('.npz') for f in files)
    # directory layout mirrors the reference
    assert f1.split(os.sep)[-6:-1] == ['modeloutput0', 'Mercury', 'Na',
                                       'uniform', 'flat'] or 'Mercury' in f1


def test_taa_tolerance_and_tiebreak():
    catalog = get_catalog()
    inp = _inputs()
    base = inp.to_dict()

    near = copy.deepcopy(base)
    near['geometry']['taa'] = 3.14 + 0.004      # within +/-0.5 deg
    nearer = copy.deepcopy(base)
    nearer['geometry']['taa'] = 3.14 + 0.001
    far = copy.deepcopy(base)
    far['geometry']['taa'] = 3.14 + 0.02        # outside window

    id_near, _ = _insert(catalog, near, 10, 10.0)
    id_nearer, _ = _insert(catalog, nearer, 20, 20.0)
    _insert(catalog, far, 40, 40.0)

    ids, _, npackets, _ = inp.search()
    # nearest stored TAA wins; far record excluded entirely
    assert ids == [id_nearer]
    assert npackets == 20


def test_other_section_mismatch_excluded():
    catalog = get_catalog()
    inp = _inputs()
    other = copy.deepcopy(inp.to_dict())
    other['options']['species'] = 'Ca'
    _insert(catalog, other, 10, 10.0)
    assert inp.search() == ([], [], 0, 0.0)


def test_delete_cascade():
    catalog = get_catalog()
    inp = _inputs()
    idnum, fname = _insert(catalog, inp.to_dict(), 10, 10.0)
    # dependent artifacts
    catalog.insert_losmodel(out_idnum=idnum, quantity='radiance',
                            filename=fname + '.model.npz')
    catalog.insert_image(out_idnum=idnum, quantity='column',
                         filename=fname + '.image.npz')
    # fitted output derived from this run
    fitted = copy.deepcopy(inp.to_dict())
    fitted['spatialdist'] = {'type': 'fitted output', 'unfit_outid': idnum,
                             'query': None}
    fid, ffile = _insert(catalog, fitted, 10, 10.0)

    files = catalog.delete_outputs([idnum])
    assert inp.search() == ([], [], 0, 0.0)
    assert not catalog.search_losmodels(out_idnum=idnum)
    assert not catalog.search_images(out_idnum=idnum)
    # fitted output cascaded too
    assert not any(r['idnum'] == fid for r in catalog.outputs.records())
    assert fname in files and ffile in files


def test_concurrent_inserts_are_serialised():
    """Two processes appending to one catalog must not lose records (the
    Condor-workers-shared-postgres pattern, now via file locks)."""
    import subprocess
    import sys
    import textwrap
    from nexoclom_tpu.utilities.config import get_config

    savepath = get_config().savepath
    script = textwrap.dedent("""
        import json, sys
        from nexoclom_tpu.utilities.catalog import Catalog
        catalog = Catalog(sys.argv[1])
        for i in range(30):
            catalog.losmodels.insert({'tag': sys.argv[2], 'i': i})
    """)
    procs = [subprocess.Popen([sys.executable, '-c', script, savepath, tag])
             for tag in ('a', 'b')]
    assert all(p.wait() == 0 for p in procs)

    from nexoclom_tpu.utilities.catalog import Catalog
    records = Catalog(savepath).losmodels.records()
    assert len(records) == 60
    ids = [r['idnum'] for r in records]
    assert len(set(ids)) == 60          # unique ids, no lost updates


def test_taa_tiebreak_wraps_at_2pi():
    """Tie-break distance wraps like the match test: a record at
    TAA=6.28 is NEARER to an input at 0.001 than one at 0.009."""
    import math
    catalog = get_catalog()
    inp = _inputs()
    d = inp.to_dict()
    wrapped, nearer = copy.deepcopy(d), copy.deepcopy(d)
    wrapped['geometry']['taa'] = 6.28           # 0.0042 rad away (wrapped)
    nearer['geometry']['taa'] = 0.009           # 0.008 rad away
    id_w, _ = _insert(catalog, wrapped, 10, 10.0)
    _insert(catalog, nearer, 20, 20.0)
    inp.geometry.taa = 0.001
    ids, _, n, _ = inp.search()
    assert ids == [id_w] and n == 10


def test_unfinished_records_do_not_count(tmp_path):
    """A record whose array file was never written (crash between insert
    and save) is invisible to search — resume re-runs that work."""
    catalog = get_catalog()
    inp = _inputs()
    inp.geometry.taa = 2.22
    idnum, fname = catalog.insert_output(inp.to_dict(), 777, 777.0)
    assert not os.path.exists(fname)
    ids, files, n, _ = inp.search()
    assert idnum not in ids and n == 0
    open(fname, 'wb').close()                   # "the save finished"
    ids, files, n, _ = inp.search()
    assert ids == [idnum] and n == 777
