"""One-time conversion of the reference model's physics data assets into
nexoclom_tpu's vendored CSV tables.

Sources (read-only, see SURVEY.md section 2.5):
  * /root/reference/nexoclom/data/PlanetaryConstants.dat  (colon-separated text)
  * /root/reference/nexoclom/data/g-values/g-values.pkl   (pandas pickle; the
    table actually loaded by the reference at runtime: Killen et al. 2009
    rows plus two synthetic test entries, refpoint column per row.  The
    Killen 2022 CSVs shipped alongside are NOT in the runtime pickle and are
    never read by the reference, so they are deliberately not vendored.)
  * /root/reference/nexoclom/data/Loss/photorates.pkl     (pandas pickle of
    Huebner & Mukherjee 2011 + Berezhnoy 2008/2013 rate coefficients)

Outputs (committed in nexoclom_tpu/data/):
  * planetary_constants.csv
  * gvalues.csv
  * gvalues_killen2022.csv (shipped by the reference, never loaded by it;
    selectable here via options.gvalue_version = Killen2022)
  * photorates.csv
"""
import os

import pandas as pd

REF = '/root/reference/nexoclom/data'
OUT = os.path.join(os.path.dirname(__file__), '..', 'nexoclom_tpu', 'data')


def convert_planetary_constants():
    table = pd.read_csv(os.path.join(REF, 'PlanetaryConstants.dat'),
                        skipinitialspace=True, skip_blank_lines=True,
                        comment='#', sep=':')
    table.columns = [c.strip() for c in table.columns]
    for col in ('Object', 'orbits'):
        table[col] = table[col].str.strip()
    table.to_csv(os.path.join(OUT, 'planetary_constants.csv'), index=False)
    print(f'planetary_constants.csv: {len(table)} objects')


def convert_gvalues():
    g = pd.read_pickle(os.path.join(REF, 'g-values', 'g-values.pkl'))
    g = g[['species', 'wavelength', 'velocity', 'gvalue', 'refpoint',
           'reference']].copy()
    g = g.sort_values(['species', 'wavelength', 'velocity'])
    g.to_csv(os.path.join(OUT, 'gvalues.csv'), index=False)
    print(f'gvalues.csv: {len(g)} rows, species={sorted(g.species.unique())}')


def convert_gvalues_2022():
    # the reference ships these but never loads them; vendored as a
    # selectable dataset (options.gvalue_version = Killen2022)
    from nexoclom_tpu.atomicdata.initialize_atomicdata import (
        make_gvalue_table_2022)
    t = make_gvalue_table_2022(os.path.join(REF, 'g-values'),
                               os.path.join(OUT, 'gvalues_killen2022.csv'))
    print(f'gvalues_killen2022.csv: {len(t)} rows, '
          f'species={sorted(t.species.unique())}')


def convert_photorates():
    p = pd.read_pickle(os.path.join(REF, 'Loss', 'photorates.pkl'))
    p = p[['species', 'reaction', 'kappa', 'reference', 'best_version']].copy()
    p.to_csv(os.path.join(OUT, 'photorates.csv'), index=False)
    print(f'photorates.csv: {len(p)} rows, species={sorted(p.species.unique())}')


if __name__ == '__main__':
    os.makedirs(OUT, exist_ok=True)
    convert_planetary_constants()
    convert_gvalues()
    convert_gvalues_2022()
    convert_photorates()
