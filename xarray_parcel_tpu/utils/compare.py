"""Tolerance comparison utilities — the validation harness's reporting layer.

Equivalents of the reference's ``compare`` / ``compare_results``
(reference: modules/parcel_test.py:37-66, 577-584): per-variable max
absolute/relative diff with NaN-pattern equality, reported as a table —
used for oracle-vs-vector and cross-version result diffs.
"""

import numpy as np


def compare(x, y, name='value', tolerance=1e-5):
    """Compare array ``x`` to reference ``y``.

    Returns a dict with max_abs_diff, max_rel_diff_pct, nan_pattern_equal,
    within_tolerance; NaNs are excluded from diffs but their patterns must
    match for ``within_tolerance``.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x, y = np.broadcast_arrays(x, y)

    nan_equal = bool((np.isnan(x) == np.isnan(y)).all())
    diffs = np.abs(x - y)
    with np.errstate(divide='ignore', invalid='ignore'):
        rel = diffs / np.abs(y) * 100.0
    max_abs = float(np.nanmax(diffs)) if diffs.size else 0.0
    max_rel = float(np.nanmax(rel)) if rel.size else 0.0
    if np.isnan(max_abs):
        max_abs = 0.0                       # all-NaN comparison
    ok = nan_equal and max_abs <= tolerance
    return {'name': name, 'max_abs_diff': max_abs,
            'max_rel_diff_pct': max_rel, 'nan_pattern_equal': nan_equal,
            'within_tolerance': ok}


def compare_results(set1, set2, tolerance=1e-5, print_report=True):
    """Compare every variable of ``set1`` against reference ``set2``.

    Returns the list of per-variable reports (and prints the reference's
    diff table by default).
    """
    reports = []
    if print_report:
        print(f'{"Differences":45} {"Max abs. diff":>16} '
              f'{"Max rel. diff":>16} {"NaN ok":>7}')
    for variable in set2:
        rep = compare(np.asarray(set1[variable]), np.asarray(set2[variable]),
                      name=variable, tolerance=tolerance)
        reports.append(rep)
        if print_report:
            flag = '' if rep['within_tolerance'] else '  <-- DIFFERS'
            print(f'{variable:45} {rep["max_abs_diff"]:16.6g} '
                  f'{rep["max_rel_diff_pct"]:15.4g}% '
                  f'{str(rep["nan_pattern_equal"]):>7}{flag}')
    return reports
