"""Input-file section classes.

Reimplements the seven configuration sections of the reference input grammar
(``nexoclom/initial_state/input_classes.py``) with the same parameter names,
defaults, validation rules, and value semantics, but:

* plain floats in fixed units (radians, km/s, s, K, eV) instead of astropy
  quantities;
* a ``to_dict()`` canonical form used by the JSON catalog for run matching
  (replacing the per-section PostgreSQL search/insert methods);
* no ``eval()`` of user input (the reference evaluates the Forces booleans,
  ``input_classes.py:426-431``).

Search-tolerance parity: run matching treats two geometries as equal when the
true anomaly agrees within +/-0.5 deg (``input_classes.py:16,225-226``); that
logic lives in :mod:`nexoclom_tpu.utilities.catalog`.
"""
from __future__ import annotations

import math

from nexoclom_tpu.solarsystem import SSObject
from nexoclom_tpu.utilities.exceptions import InputError

from nexoclom_tpu.constants import TAA_MATCH_WIDTH as DTAA  # noqa: E402

TWO_PI = 2.0 * math.pi


def _parse_bool(value: str, context: str) -> bool:
    v = value.strip().casefold()
    if v in ('true', '1', 'yes'):
        return True
    if v in ('false', '0', 'no'):
        return False
    raise InputError(context, f'invalid boolean value {value!r}')


def _pair(value: str, context: str) -> tuple[float, float]:
    parts = [p.strip() for p in value.split(',')]
    if len(parts) != 2:
        raise InputError(context, f'expected two comma-separated values, '
                                  f'got {value!r}')
    return float(parts[0]), float(parts[1])


def _clamp(x: float, lo: float, hi: float) -> float:
    return min(max(x, lo), hi)


class _Section:
    """Shared value-equality / repr over the instance dict."""

    section_name = 'section'

    def __eq__(self, other):
        if not isinstance(other, type(self)):
            return False
        return self.to_dict() == other.to_dict()

    def __hash__(self):
        return hash(repr(sorted(self.to_dict().items(), key=lambda kv: kv[0])))

    def __str__(self):
        return '\n'.join(f'{self.section_name}.{k} = {v}'
                         for k, v in self.__dict__.items()
                         if not k.startswith('_'))

    def to_dict(self) -> dict:
        out = {}
        for key, value in self.__dict__.items():
            if key.startswith('_'):
                continue
            if isinstance(value, SSObject):
                value = value.object
            elif isinstance(value, (set, frozenset)):
                value = sorted(v.object if isinstance(v, SSObject) else v
                               for v in value)
            elif isinstance(value, tuple):
                value = list(value)
            out[key] = value
        return out

    # fields that round-trip list -> tuple through to_dict/from_dict
    _tuple_fields = ()

    @classmethod
    def from_dict(cls, data: dict):
        """Inverse of :meth:`to_dict` (used by Output.restore)."""
        obj = cls.__new__(cls)
        for key, value in data.items():
            if key in cls._tuple_fields and isinstance(value, list):
                value = tuple(value)
            setattr(obj, key, value)
        return obj


def effective_taa(geometry) -> float:
    """True anomaly for either geometry variant.

    'geometry without starttime' carries taa directly; 'geometry with
    starttime' derives it by Kepler propagation from the timestamp — a
    working implementation of the path the reference leaves unimplemented
    (``Output.py:95-96`` asserts on it).
    """
    if geometry.type == 'geometry with starttime':
        from nexoclom_tpu.solarsystem.planet_geometry import (
            true_anomaly_at_time)
        return true_anomaly_at_time(geometry.time, geometry.planet)
    return geometry.taa


class Geometry(_Section):
    """Planetary geometry: planet, startpoint, included objects, phase angles,
    subsolar point, and true anomaly (``input_classes.py:19-111``)."""

    section_name = 'geometry'
    _tuple_fields = ('subsolarpoint', 'phi')

    @classmethod
    def from_dict(cls, data: dict):
        obj = super().from_dict(data)
        obj.planet = SSObject(data['planet'])
        obj.objects = frozenset(SSObject(o) for o in data.get('objects', []))
        return obj

    def __init__(self, gparam: dict):
        planet = gparam.get('planet')
        if planet is None:
            raise InputError('Geometry.__init__',
                             'Planet not defined in inputfile.')
        self.planet = SSObject(planet.title())
        if self.planet.object is None:
            raise InputError('Geometry.__init__', f'Unknown planet {planet}')

        objlist = [self.planet.object]
        if self.planet.moons is not None:
            objlist.extend(m.object for m in self.planet.moons)

        self.startpoint = gparam.get('startpoint', self.planet.object).title()
        if self.startpoint not in objlist:
            raise InputError('Geometry.__init__',
                             f'{self.startpoint} is not a valid starting '
                             f'point; choices: {objlist}')

        if 'objects' in gparam:
            ordered = []
            for o in gparam['objects'].split(','):
                name = o.strip().title()
                if name not in ordered:
                    ordered.append(name)
        else:
            ordered = [self.planet.object]
            if self.startpoint != self.planet.object:
                ordered.append(self.startpoint)
        for obj in ordered:
            if obj not in objlist:
                raise InputError('Geometry.__init__',
                                 f'Invalid object {obj} in geometry.objects')
        self.objects = frozenset(SSObject(o) for o in ordered)
        # geometry.phi entries map to the moons in input-file order (not
        # serialized: catalog restores fall back to sorted order)
        self._moon_order = [o for o in ordered if o != self.planet.object]

        if 'starttime' in gparam:
            self.type = 'geometry with starttime'
            self.time = gparam['starttime'].upper()
        else:
            self.type = 'geometry without starttime'
            if len(self.planet) == 1:
                self.phi = None
            elif 'phi' in gparam:
                phi = tuple(float(p) for p in gparam['phi'].split(','))
                nmoons = len(self.objects - {self.planet})
                if len(phi) != nmoons:
                    raise InputError('Geometry.__init__',
                                     'The wrong number of orbital positions '
                                     'was given.')
                self.phi = phi
            else:
                raise InputError('Geometry.__init__',
                                 'geometry.phi was not specified.')

            if 'subsolarpoint' in gparam:
                try:
                    self.subsolarpoint = _pair(gparam['subsolarpoint'],
                                               'Geometry.__init__')
                except (ValueError, InputError):
                    raise InputError('Geometry.__init__',
                                     'The format for geometry.subsolarpoint '
                                     'is wrong.')
            else:
                self.subsolarpoint = (0.0, 0.0)

            self.taa = float(gparam.get('taa', 0.0))


class SurfaceInteraction(_Section):
    """Sticking/re-emission model (``input_classes.py:250-318``)."""

    section_name = 'surfaceinteraction'
    _tuple_fields = ('A',)

    def __init__(self, sparam: dict):
        sticktype = sparam.get('sticktype', '').lower() or None

        if sticktype == 'temperature dependent':
            self.sticktype = sticktype
            if 'accomfactor' not in sparam:
                raise InputError('SurfaceInteraction.__init__',
                                 'surfaceinteraction.accomfactor not given.')
            self.accomfactor = float(sparam['accomfactor'])
            if 'a' in sparam:
                A = tuple(float(a) for a in sparam['a'].split(','))
                if len(A) != 3:
                    raise InputError('SurfaceInteraction.__init__',
                                     'surfaceinteraction.A must have 3 values')
                self.A = A
            else:
                self.A = (1.57014, -0.006262, 0.1614157)
        elif sticktype == 'surface map':
            self.sticktype = sticktype
            self.stick_mapfile = sparam.get('stick_mapfile', 'default')
            subsolarlon = sparam.get('subsolarlon')
            self.subsolarlon = (float(subsolarlon)
                                if subsolarlon is not None else None)
            if 'accomfactor' not in sparam:
                raise InputError('SurfaceInteraction.__init__',
                                 'surfaceinteraction.accomfactor not given.')
            self.accomfactor = float(sparam['accomfactor'])
        elif 'stickcoef' in sparam:
            self.sticktype = 'constant'
            self.stickcoef = _clamp(float(sparam['stickcoef']), 0.0, 1.0)
            if 'accomfactor' in sparam:
                self.accomfactor = float(sparam['accomfactor'])
            elif self.stickcoef == 1:
                self.accomfactor = None
            else:
                raise InputError('SurfaceInteraction.__init__',
                                 'surfaceinteraction.accomfactor not given.')
        else:
            self.sticktype = 'constant'
            self.stickcoef = 1.0
            self.accomfactor = None


def surface_bounces(sint) -> bool:
    """True when the surface interaction re-emits (anything but constant
    full sticking) — the condition that enables bounce physics on the
    planet and, for satellite runs, on the moon (quirk F21)."""
    return not (sint.sticktype == 'constant' and
                getattr(sint, 'stickcoef', None) == 1.0)


class Forces(_Section):
    """Force toggles (``input_classes.py:419-431``); both default True."""

    section_name = 'forces'

    def __init__(self, fparam: dict):
        self.gravity = (_parse_bool(fparam['gravity'], 'Forces.__init__')
                        if 'gravity' in fparam else True)
        self.radpres = (_parse_bool(fparam['radpres'], 'Forces.__init__')
                        if 'radpres' in fparam else True)


class SpatialDist(_Section):
    """Source spatial distribution (``input_classes.py:490-569``)."""

    section_name = 'spatialdist'
    _tuple_fields = ('longitude', 'latitude')

    def __init__(self, sparam: dict):
        if 'type' not in sparam:
            raise InputError('SpatialDist.__init__', 'SpatialDist.type not given')
        self.type = sparam['type']

        if self.type == 'uniform':
            self.exobase = float(sparam.get('exobase', 1.0))
            if 'longitude' in sparam:
                lon0, lon1 = _pair(sparam['longitude'], 'SpatialDist.__init__')
                self.longitude = (_clamp(lon0, 0.0, TWO_PI),
                                  _clamp(lon1, 0.0, TWO_PI))
            else:
                self.longitude = (0.0, TWO_PI)
            if 'latitude' in sparam:
                lat0, lat1 = _pair(sparam['latitude'], 'SpatialDist.__init__')
                lat0 = _clamp(lat0, -math.pi / 2, math.pi / 2)
                lat1 = _clamp(lat1, -math.pi / 2, math.pi / 2)
                if lat0 > lat1:
                    raise InputError('SpatialDist.__init__',
                                     'SpatialDist.latitude[0] > '
                                     'SpatialDist.latitude[1]')
                self.latitude = (lat0, lat1)
            else:
                self.latitude = (-math.pi / 2, math.pi / 2)
        elif self.type == 'surface map':
            self.exobase = float(sparam.get('exobase', 1.0))
            self.mapfile = sparam.get('mapfile', 'default')
            subsolarlon = sparam.get('subsolarlon')
            self.subsolarlon = (float(subsolarlon)
                                if subsolarlon is not None else None)
            self.coordinate_system = sparam.get('coordinate_system',
                                                'solar-fixed')
        elif self.type == 'surface spot':
            self.exobase = float(sparam.get('exobase', 1.0))
            for par in ('longitude', 'latitude', 'sigma'):
                if par not in sparam:
                    raise InputError('SpatialDist.__init__',
                                     f'SpatialDist.{par} not given.')
            self.longitude = float(sparam['longitude'])
            self.latitude = float(sparam['latitude'])
            self.sigma = float(sparam['sigma'])
        elif self.type == 'fitted output':
            self.unfit_outid = -1
            self.query = None
        else:
            raise InputError('SpatialDist.__init__',
                             f'SpatialDist.type = {self.type} not defined.')


class SpeedDist(_Section):
    """Source speed distribution (``input_classes.py:702-761``).  Speeds in
    km/s, temperature in K, sputtering binding energy U in eV."""

    section_name = 'speeddist'

    def __init__(self, sparam: dict):
        if 'type' not in sparam:
            raise InputError('SpeedDist.__init__', 'SpeedDist.type not given')
        self.type = sparam['type']

        def require(par):
            if par not in sparam:
                raise InputError('SpeedDist.__init__',
                                 f'SpeedDist.{par} not given.')
            return sparam[par]

        if self.type == 'gaussian':
            self.vprob = float(require('vprob'))
            self.sigma = float(require('sigma'))
        elif self.type == 'sputtering':
            self.alpha = float(require('alpha'))
            self.beta = float(require('beta'))
            self.U = float(require('u'))
        elif self.type == 'maxwellian':
            self.temperature = float(require('temperature'))
        elif self.type == 'flat':
            self.vprob = float(require('vprob'))
            self.delv = float(require('delv'))
        elif self.type == 'user defined':
            self.vdistfile = sparam.get('vdistfile', 'default')
        elif self.type == 'fitted output':
            self.unfit_outid = -1
            self.query = None
        else:
            raise InputError('SpeedDist.__init__',
                             f'SpeedDist.type = {self.type} not available')


class AngularDist(_Section):
    """Source angular distribution (``input_classes.py:905-960``)."""

    section_name = 'angulardist'
    _tuple_fields = ('azimuth', 'altitude')

    def __init__(self, aparam: dict):
        if 'type' not in aparam:
            self.type = 'isotropic'
            self.azimuth = (0.0, TWO_PI)
            self.altitude = (0.0, math.pi / 2)
            return

        self.type = aparam['type'].lower()
        if self.type == 'radial':
            pass
        elif self.type == 'isotropic':
            if 'azimuth' in aparam:
                az0, az1 = _pair(aparam['azimuth'], 'AngularDist.__init__')
                self.azimuth = (_clamp(az0, 0.0, TWO_PI),
                                _clamp(az1, 0.0, TWO_PI))
            else:
                self.azimuth = (0.0, TWO_PI)
            if 'altitude' in aparam:
                alt0, alt1 = _pair(aparam['altitude'], 'AngularDist.__init__')
                alt0 = _clamp(alt0, 0.0, math.pi / 2)
                alt1 = _clamp(alt1, 0.0, math.pi / 2)
                if alt0 > alt1:
                    raise InputError('AngularDist.__init__',
                                     'AngularDist.altitude[0] > '
                                     'AngularDist.altitude[1]')
                self.altitude = (alt0, alt1)
            else:
                self.altitude = (0.0, math.pi / 2)
        elif self.type == '2d':
            if 'altitude' in aparam:
                alt0, alt1 = _pair(aparam['altitude'], 'AngularDist.__init__')
                alt0 = _clamp(alt0, 0.0, math.pi)
                alt1 = _clamp(alt1, 0.0, math.pi)
                if alt0 > alt1:
                    raise InputError('AngularDist.__init__',
                                     'AngularDist.altitude[0] > '
                                     'AngularDist.altitude[1]')
                self.altitude = (alt0, alt1)
            else:
                self.altitude = (0.0, math.pi)
        else:
            raise InputError('AngularDist.__init__',
                             f'AngularDist.type = {self.type} not defined.')


class Options(_Section):
    """Runtime options (``input_classes.py:1055-1100``).

    Parity notes: the reference's ``stepsize`` alias is broken (reads the
    wrong key, ``input_classes.py:1086-1087``); here both spellings work.
    ``resolution`` is stored as a float (the reference keeps the raw string
    when explicitly specified).
    """

    section_name = 'options'

    def __init__(self, oparam: dict):
        if 'endtime' not in oparam:
            raise InputError('Options.__init__', 'options.endtime not specified.')
        self.endtime = float(oparam['endtime'])

        if 'species' in oparam:
            self.species = oparam['species'].capitalize()
        elif 'atom' in oparam:
            self.species = oparam['atom'].capitalize()
        else:
            raise InputError('Options.__init__', 'options.species not specified.')

        # Selectable g-value dataset (extension): the reference SHIPS the
        # Killen 2022 CSVs (data/g-values/{Na,Ca,Mg}.Killen2022.csv) but
        # its runtime never loads them; here `options.gvalue_version =
        # Killen2022` selects them for radiation pressure and radiance
        # weighting.  Default stays Killen2009 (parity); the attribute is
        # set only for non-default choices so the canonical dict (and
        # catalog matching against earlier runs) is unchanged.
        if 'gvalue_version' in oparam:
            from nexoclom_tpu.atomicdata.g_values import (
                DEFAULT_GVALUE_VERSION, normalize_gvalue_version)
            try:
                version = normalize_gvalue_version(oparam['gvalue_version'])
            except ValueError as exc:
                raise InputError('Options.__init__', str(exc))
            if version != DEFAULT_GVALUE_VERSION:
                self.gvalue_version = version

        # Radiation-pressure stage-evaluation mode (extension): 'stage'
        # (parity default — a(v) interpolated at every RK stage like
        # state.py:38-52), 'tangent' (one shared knot walk per step
        # returning a and da/dv, stages reconstructed first-order —
        # deviation ~200x inside the relu-compression envelope, measured
        # docs/scaling.md), or 'step' (frozen pre-step lookup,
        # radpres_per_stage=False).  Attribute set only for non-default
        # choices so the canonical dict is unchanged.
        if 'radpres_mode' in oparam:
            mode = oparam['radpres_mode'].strip().lower()
            if mode not in ('stage', 'tangent', 'step'):
                raise InputError('Options.__init__',
                                 "options.radpres_mode must be 'stage', "
                                 "'tangent', or 'step'")
            if mode != 'stage':
                self.radpres_mode = mode

        self.lifetime = float(oparam.get('lifetime', 0))

        # Extension (quirk F22): constant electron-impact and charge-
        # exchange rates summed into the ionization rate — the structure
        # the reference stubs out forever (``ionizerate = photorate
        # + eimprate + chxrate``, state.py:56-70 commented; LossInfo.py:9-10
        # initialises both to 0 with empty '# Electron impact' sections).
        # Attributes are set ONLY when nonzero so the canonical dict (and
        # catalog matching against pre-extension runs) is unchanged.
        eimp = float(oparam.get('eimp_rate', 0.0))
        chx = float(oparam.get('chx_rate', 0.0))
        if eimp or chx:
            if self.lifetime > 0:
                raise InputError('Options.__init__',
                                 'options.eimp_rate/chx_rate cannot be '
                                 'combined with an explicit lifetime > 0 '
                                 '(the total rate is then 1/lifetime)')
            if eimp < 0 or chx < 0:
                raise InputError('Options.__init__',
                                 'options.eimp_rate/chx_rate must be >= 0')
            if eimp:
                self.eimp_rate = eimp
            if chx:
                self.chx_rate = chx

        # Extension (quirk F23): spatially varying electron-impact rate
        # (plasma torus / ionosphere) from a profile file — the magcoord
        # path the reference stubs (state.py:56-63).  Exclusive with the
        # constant eimp_rate; the file is validated at Output setup.
        profile = oparam.get('eimp_profile')
        if profile:
            if self.lifetime > 0:
                raise InputError('Options.__init__',
                                 'options.eimp_profile cannot be combined '
                                 'with an explicit lifetime > 0')
            if eimp:
                raise InputError('Options.__init__',
                                 'give options.eimp_rate OR '
                                 'options.eimp_profile, not both')
            self.eimp_profile = profile

        # Extension (quirk F25): the profile's symmetry axis tilted from
        # the spin axis and co-rotating with the planet — the
        # centrifugal-equator geometry of a real plasma torus.  Degrees
        # for tilt/phase, hours for the period (default: the planet's
        # sidereal rotation period from the constants table).  Attributes
        # set only when the tilt is nonzero (catalog compatibility).
        tilt = float(oparam.get('eimp_tilt', 0.0))
        if tilt:
            if not profile:
                raise InputError('Options.__init__',
                                 'options.eimp_tilt requires '
                                 'options.eimp_profile')
            if not 0.0 < tilt < 90.0:
                raise InputError('Options.__init__',
                                 'options.eimp_tilt must be in (0, 90) '
                                 'degrees')
            self.eimp_tilt = tilt
            self.eimp_tilt_phase = float(oparam.get('eimp_tilt_phase', 0.0))
        elif 'eimp_tilt_phase' in oparam:
            raise InputError('Options.__init__',
                             'options.eimp_tilt_phase requires a '
                             'nonzero options.eimp_tilt')
        # the co-rotation period is shared by the F25 tilt and the F28
        # longitude factor (build_force_table uses one rot_omega for
        # both), so an untilted longitude-structured profile may still
        # set a custom period (advisor round 2)
        if 'eimp_tilt_period' in oparam:
            if not profile:
                raise InputError('Options.__init__',
                                 'options.eimp_tilt_period requires '
                                 'options.eimp_profile')
            period = float(oparam['eimp_tilt_period'])
            if period <= 0:
                raise InputError('Options.__init__',
                                 'options.eimp_tilt_period must be '
                                 '> 0 hours')
            self.eimp_tilt_period = period

        # Extension (quirk F28): azimuth (degrees, orbit_state convention)
        # of the profile's phi = 0 longitude at the observation time, for
        # longitude-structured (System III) profiles; the factor itself
        # lives in the profile file (phi/rate_phi)
        if 'eimp_phi_phase' in oparam:
            if not profile:
                raise InputError('Options.__init__',
                                 'options.eimp_phi_phase requires '
                                 'options.eimp_profile')
            phi_phase = float(oparam['eimp_phi_phase'])
            if phi_phase:
                # zero is the default — leave the attribute unset so the
                # canonical dict (and catalog matching) is unchanged
                self.eimp_phi_phase = phi_phase

        if 'outeredge' in oparam:
            self.outeredge = float(oparam['outeredge'])
        elif 'outer_edge' in oparam:
            self.outeredge = float(oparam['outer_edge'])
        else:
            self.outeredge = 1e30

        if 'step_size' in oparam:
            self.step_size = float(oparam['step_size'])
        elif 'stepsize' in oparam:
            self.step_size = float(oparam['stepsize'])
        else:
            self.step_size = 0.0

        if self.step_size == 0:
            self.resolution = float(oparam.get('resolution', 1e-4))
        else:
            self.resolution = None

        # Adaptive orchestration (extension): how large adaptive batches
        # are scheduled onto the chip — 'auto' (default: the in-loop
        # pool refill above its measured amortisation point, sequential
        # chunking below), 'chunked', or 'pool' (force either;
        # ops/integrator.adaptive_production_run).  Physics-identical
        # for deterministic specs; bounce RNG streams differ between
        # orchestrations (both valid samples).  Attribute set only for
        # non-default choices so the canonical dict (and catalog
        # matching) is unchanged.
        if 'adaptive_orchestrator' in oparam:
            orch = oparam['adaptive_orchestrator'].strip().lower()
            if orch not in ('auto', 'chunked', 'pool'):
                raise InputError('Options.__init__',
                                 "options.adaptive_orchestrator must be "
                                 "'auto', 'chunked', or 'pool'")
            if self.step_size != 0:
                raise InputError('Options.__init__',
                                 'options.adaptive_orchestrator requires '
                                 'adaptive stepping (step_size = 0)')
            if orch != 'auto':
                self.adaptive_orchestrator = orch

        self.fitted = (oparam.get('fitted', 'false').casefold() ==
                       'true'.casefold())
