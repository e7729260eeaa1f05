"""Rebuild the vendored atomic-data tables from raw data files.

Parity with ``nexoclom/atomicdata/initialize_atomicdata.py``: parses the two
raw formats the reference distributes and writes this package's CSV tables.

* g-value ``.dat``: a header line ``a = <refpoint AU>`` followed by
  colon-separated columns ``vel : lambda1 : lambda2 ...`` (velocities in
  km/s, g-values per line in photons/s at the refpoint distance);
* g-value ``.csv`` (Killen 2022): ``velocity,<lambda>,...`` columns at a
  fixed refpoint;
* photo-rate ``.dat``: header lines tagged ``// REFERENCE`` etc., then
  ``species : reaction : kappa : ...`` rows between ``\\begindata`` and
  ``\\enddata``.

Unlike the reference (which prompts interactively to pick among duplicate
reactions), duplicates are kept and flagged ``best_version=False`` for all
but the first occurrence; the rate sum intentionally still includes all rows
(QUIRKS.md R2).
"""
from __future__ import annotations

import glob
import os

import pandas as pd

_DATAPATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), 'data')


def parse_gvalue_dat(datafile: str, reference='Killen et al. (2009)'
                     ) -> pd.DataFrame:
    """One colon-separated g-value file -> long-format rows."""
    species = os.path.basename(datafile).split('.')[0]
    with open(datafile) as f:
        header = f.readline()
    refpoint = float(header.split('=')[1])

    table = pd.read_csv(datafile, sep=':', skiprows=1)
    wavelengths = [float(w) for w in table.columns[1:]]
    table.columns = ['velocity'] + wavelengths

    rows = []
    for wave in wavelengths:
        for _, row in table.iterrows():
            rows.append(dict(species=species, wavelength=wave,
                             velocity=float(row['velocity']),
                             gvalue=float(row[wave]), refpoint=refpoint,
                             reference=reference))
    return pd.DataFrame(rows)


def parse_gvalue_csv(csvfile: str, species: str, wavelength: float,
                     refpoint: float = 0.352,
                     reference='Killen et al. (2022)') -> pd.DataFrame:
    table = pd.read_csv(csvfile)
    column = str(int(wavelength))
    return pd.DataFrame(dict(species=species, wavelength=wavelength,
                             velocity=table['velocity'].astype(float),
                             gvalue=table[column].astype(float),
                             refpoint=refpoint, reference=reference))


def make_gvalue_table_2022(source_dir: str, outfile: str | None = None
                           ) -> pd.DataFrame:
    """Parse the ``<species>.Killen2022.csv`` g-value files into the vendored
    long-format CSV (``gvalues_killen2022.csv``).

    The reference ships these tables (``data/g-values/{Na,Ca,Mg}.Killen2022.csv``)
    but its runtime never loads them; here they are a selectable dataset
    (``options.gvalue_version = Killen2022``).  Each file is
    ``velocity,<lambda>[,<lambda>...]`` columns; the refpoint is 0.352 AU —
    the 2022 values at matching velocities are the same scale as the 2009
    rows quoted at 0.352 (e.g. Na 5891 at -50 km/s: 82.7 vs 80.2/s)."""
    frames = []
    for f in sorted(glob.glob(os.path.join(source_dir, '*.Killen2022.csv'))):
        species = os.path.basename(f).split('.')[0]
        for column in pd.read_csv(f, nrows=0).columns[1:]:
            frames.append(parse_gvalue_csv(f, species, float(column)))
    table = pd.concat(frames, ignore_index=True)
    table = table.sort_values(['species', 'wavelength', 'velocity'])
    if outfile is None:
        outfile = os.path.join(_DATAPATH, 'gvalues_killen2022.csv')
    table.to_csv(outfile, index=False)
    return table


def make_gvalue_table(source_dir: str, outfile: str | None = None
                      ) -> pd.DataFrame:
    """Parse every ``*.dat`` g-value file in ``source_dir`` into the vendored
    CSV format."""
    frames = [parse_gvalue_dat(f)
              for f in sorted(glob.glob(os.path.join(source_dir, '*.dat')))]
    table = pd.concat(frames, ignore_index=True)
    table = table.sort_values(['species', 'wavelength', 'velocity'])
    if outfile is None:
        outfile = os.path.join(_DATAPATH, 'gvalues.csv')
    table.to_csv(outfile, index=False)
    return table


def parse_photorate_dat(datafile: str) -> pd.DataFrame:
    """One photo-rate file -> (species, reaction, kappa, reference) rows."""
    rows = []
    reference = ''
    for line in open(datafile):
        if 'reference' in line.lower() and '//' in line:
            reference = line.split('//')[0].strip()
        else:
            parts = line.split(':')
            if len(parts) == 4:
                try:
                    kappa = float(parts[2].strip())
                except ValueError:
                    continue
                rows.append(dict(species=parts[0].strip(),
                                 reaction=parts[1].strip(),
                                 kappa=kappa, reference=reference))
    return pd.DataFrame(rows)


def make_photorates_table(source_dir: str, outfile: str | None = None
                          ) -> pd.DataFrame:
    frames = [parse_photorate_dat(f)
              for f in sorted(glob.glob(os.path.join(source_dir, '*.dat')))]
    table = pd.concat(frames, ignore_index=True)
    # flag duplicates (first occurrence wins) without interactive prompting
    table['best_version'] = ~table.duplicated(subset='reaction', keep='first')
    if outfile is None:
        outfile = os.path.join(_DATAPATH, 'photorates.csv')
    table.to_csv(outfile, index=False)
    return table
