"""Input-file parsing tests: exact section values for the bundled fixtures,
defaulting rules, and validation errors (mirrors the reference's
``test_input_classes.py`` strategy of literal expected dicts)."""
import math
import os

import pytest

from nexoclom_tpu.initial_state import (AngularDist, Forces, Input, Options,
                                        SpatialDist, SpeedDist,
                                        SurfaceInteraction, Geometry)
from nexoclom_tpu.utilities.exceptions import InputError

pytestmark = pytest.mark.initial_state

INPUTFILES = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')


def test_gravity_input_exact():
    inp = Input(os.path.join(INPUTFILES, 'mercury_gravity.input'))
    assert inp.geometry.planet.object == 'Mercury'
    assert inp.geometry.taa == 3.14
    assert inp.geometry.subsolarpoint == (0.0, 0.0)
    assert inp.geometry.type == 'geometry without starttime'
    assert inp.forces.gravity is True
    assert inp.forces.radpres is False
    assert inp.spatialdist.type == 'uniform'
    assert inp.spatialdist.exobase == 1.0
    assert inp.spatialdist.longitude == (0.0, 2 * math.pi)
    assert inp.spatialdist.latitude == (-math.pi / 2, math.pi / 2)
    assert inp.speeddist.type == 'flat'
    assert inp.speeddist.vprob == 4.0 and inp.speeddist.delv == 4.0
    # angulardist section absent -> default isotropic hemisphere
    assert inp.angulardist.type == 'isotropic'
    assert inp.angulardist.altitude == (0.0, math.pi / 2)
    assert inp.angulardist.azimuth == (0.0, 2 * math.pi)
    assert inp.options.endtime == 20000.0
    assert inp.options.step_size == 30.0
    assert inp.options.resolution is None
    assert inp.options.species == 'Na'
    assert inp.options.outeredge == 1e30
    # surfaceinteraction absent -> full sticking
    assert inp.surfaceinteraction.sticktype == 'constant'
    assert inp.surfaceinteraction.stickcoef == 1.0
    assert inp.surfaceinteraction.accomfactor is None


def test_ca_spot_input_exact():
    inp = Input(os.path.join(INPUTFILES, 'mercury_ca_spot.input'))
    assert inp.spatialdist.type == 'surface spot'
    assert inp.spatialdist.longitude == pytest.approx(3 * math.pi / 2)
    assert inp.spatialdist.sigma == pytest.approx(math.radians(50))
    assert inp.speeddist.type == 'maxwellian'
    assert inp.speeddist.temperature == 50000.0
    assert inp.options.species == 'Ca'
    assert inp.options.outeredge == 15.0


def test_input_equality_and_dict_roundtrip():
    a = Input(os.path.join(INPUTFILES, 'mercury_gravity.input'))
    b = Input(os.path.join(INPUTFILES, 'mercury_gravity.input'))
    c = Input(os.path.join(INPUTFILES, 'mercury_ca_spot.input'))
    assert a == b
    assert a != c
    d = a.to_dict()
    assert d['geometry']['planet'] == 'Mercury'
    assert d['options']['species'] == 'Na'
    import json
    json.dumps(d)  # canonical dict must be JSON-serialisable


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        Input('/nonexistent/file.input')


def test_geometry_requires_planet():
    with pytest.raises(InputError):
        Geometry({})


def test_geometry_bad_startpoint():
    with pytest.raises(InputError):
        Geometry({'planet': 'Mercury', 'startpoint': 'Io'})


def test_options_requires_endtime_species():
    with pytest.raises(InputError):
        Options({'species': 'Na'})
    with pytest.raises(InputError):
        Options({'endtime': '100'})
    # 'atom' alias works
    opt = Options({'endtime': '100', 'atom': 'na'})
    assert opt.species == 'Na'


def test_options_stepsize_alias():
    # the reference's 'stepsize' alias is broken; ours works (QUIRKS.md)
    opt = Options({'endtime': '100', 'species': 'Na', 'stepsize': '15'})
    assert opt.step_size == 15.0
    assert opt.resolution is None


def test_options_adaptive_defaults():
    opt = Options({'endtime': '100', 'species': 'Na'})
    assert opt.step_size == 0.0
    assert opt.resolution == 1e-4
    assert opt.lifetime == 0.0
    assert opt.fitted is False


def test_forces_no_eval():
    f = Forces({'gravity': 'false', 'radpres': 'TRUE'})
    assert f.gravity is False and f.radpres is True
    with pytest.raises(InputError):
        Forces({'gravity': '__import__("os")'})


def test_spatialdist_validation():
    with pytest.raises(InputError):
        SpatialDist({})
    with pytest.raises(InputError):
        SpatialDist({'type': 'nope'})
    with pytest.raises(InputError):
        SpatialDist({'type': 'uniform', 'latitude': '1.0, -1.0'})
    with pytest.raises(InputError):
        SpatialDist({'type': 'surface spot', 'longitude': '0'})
    sd = SpatialDist({'type': 'uniform', 'longitude': '-1, 9'})
    assert sd.longitude == (0.0, 2 * math.pi)  # clamped


def test_speeddist_validation():
    with pytest.raises(InputError):
        SpeedDist({'type': 'gaussian', 'vprob': '2'})
    sp = SpeedDist({'type': 'sputtering', 'alpha': '3', 'beta': '0', 'u': '2'})
    assert (sp.alpha, sp.beta, sp.U) == (3.0, 0.0, 2.0)


def test_angulardist_2d_default():
    ad = AngularDist({'type': '2d'})
    assert ad.altitude == (0.0, math.pi)


def test_surfaceinteraction_accom_required():
    with pytest.raises(InputError):
        SurfaceInteraction({'stickcoef': '0.5'})
    si = SurfaceInteraction({'stickcoef': '0.5', 'accomfactor': '0.3'})
    assert si.stickcoef == 0.5 and si.accomfactor == 0.3
    # clipping
    si = SurfaceInteraction({'stickcoef': '1.7'})
    assert si.stickcoef == 1.0
    # temperature dependent defaults
    si = SurfaceInteraction({'sticktype': 'Temperature Dependent',
                             'accomfactor': '1'})
    assert si.A == (1.57014, -0.006262, 0.1614157)


def test_options_radpres_mode():
    """Extension knob: options.radpres_mode selects the RK stage-evaluation
    strategy ('stage' default / 'tangent' / 'step'); only non-default
    choices reach the canonical dict, and the engine spec maps them to
    EngineSpec.radpres_per_stage."""
    from nexoclom_tpu.initial_state.sections import Options
    from nexoclom_tpu.utilities.exceptions import InputError
    base = {'endtime': '3600', 'species': 'Ca'}
    default = Options(dict(base))
    assert not hasattr(default, 'radpres_mode')
    stage = Options({**base, 'radpres_mode': 'stage'})
    assert stage.to_dict() == default.to_dict()
    tangent = Options({**base, 'radpres_mode': 'Tangent'})
    assert tangent.radpres_mode == 'tangent'
    step = Options({**base, 'radpres_mode': 'step'})
    assert step.radpres_mode == 'step'
    try:
        Options({**base, 'radpres_mode': 'per-stage'})
        raise AssertionError('expected InputError')
    except InputError:
        pass

    import os
    from nexoclom_tpu.initial_state import Input
    from nexoclom_tpu.particle_tracking.output import engine_spec_from_inputs
    here = os.path.join(os.path.dirname(__file__), 'data', 'inputfiles')
    inp = Input(os.path.join(here, 'mercury_ca_spot.input'))
    assert engine_spec_from_inputs(inp).radpres_per_stage is True
    inp.options.radpres_mode = 'tangent'
    assert engine_spec_from_inputs(inp).radpres_per_stage == 'tangent'
    inp.options.radpres_mode = 'step'
    assert engine_spec_from_inputs(inp).radpres_per_stage is False


def test_options_adaptive_orchestrator():
    """Extension knob: options.adaptive_orchestrator picks the adaptive
    scheduling strategy ('auto' default / 'chunked' / 'pool'); 'auto'
    leaves the canonical dict unchanged, and the knob requires adaptive
    stepping (step_size = 0)."""
    base = {'endtime': '3600', 'species': 'Ca'}
    default = Options(dict(base))
    assert not hasattr(default, 'adaptive_orchestrator')
    auto = Options({**base, 'adaptive_orchestrator': 'Auto'})
    assert not hasattr(auto, 'adaptive_orchestrator')
    assert auto.to_dict() == default.to_dict()
    pool = Options({**base, 'adaptive_orchestrator': 'POOL'})
    assert pool.adaptive_orchestrator == 'pool'
    chunked = Options({**base, 'adaptive_orchestrator': 'chunked'})
    assert chunked.adaptive_orchestrator == 'chunked'
    with pytest.raises(InputError):
        Options({**base, 'adaptive_orchestrator': 'segmented'})
    with pytest.raises(InputError):
        Options({**base, 'step_size': '30',
                 'adaptive_orchestrator': 'pool'})
