"""Photoionization loss configuration (parity with
``nexoclom/initial_state/LossInfo.py``).

* ``lifetime < 0``: generic loss at rate 1/|lifetime| (applied everywhere,
  shadow-independent — see ``particle_tracking/state.py:44-46``; note the
  reference only reaches the state-function lifetime branch when
  ``lifetime > 0``, in which case LossInfo is not built at all.  LossInfo with
  negative lifetime produces a *shadow-masked* generic rate, matching
  ``state.py:48-52``).
* ``lifetime == 0``: photo rate from the Huebner/Berezhnoy tables scaled by
  1/a^2.
* ``eimp`` / ``chX``: optional constant electron-impact and charge-exchange
  rates (1/s) summed into the total ionization rate by the engine — the
  structure the reference stubs out (``LossInfo.py:9-10`` initialises both
  to 0; ``state.py:56-70`` comments out the sum).  Quirk F22: eimp applies
  everywhere (electrons are not blocked by the planet's shadow), chX is
  shadow-masked like the photo rate (solar-wind ions are).
"""
from __future__ import annotations

from nexoclom_tpu.atomicdata import PhotoRate


class LossInfo:
    def __init__(self, species: str, lifetime: float, aplanet: float,
                 eimp: float = 0.0, chX: float = 0.0):
        self.photo = 0.0
        self.eimp = float(eimp)
        self.chX = float(chX)
        self.reactions = None

        if lifetime < 0:
            self.photo = abs(1.0 / lifetime)
            self.reactions = ['Generic photo reaction']
        elif lifetime == 0:
            photo = PhotoRate(species, aplanet)
            self.photo = photo.rate
            if photo.reactions is not None:
                self.reactions = list(photo.reactions['reaction'].values)
        else:
            print('LossInfo objects should not be instantiated with '
                  'lifetime > 0')

    def __len__(self):
        return len(self.reactions) if self.reactions is not None else 0

    def __str__(self):
        if len(self) == 0:
            return 'No reactions included'
        result = 'Included Reactions: ' + ', '.join(self.reactions)
        if self.photo:
            result += f'\nPhoto Rate = {self.photo:0.2e} /s'
        if self.eimp:
            result += f'\nElectron Impact Rate = {self.eimp:0.2e} /s'
        if self.chX:
            result += f'\nCharge Exchange Rate = {self.chX:0.2e} /s'
        return result
