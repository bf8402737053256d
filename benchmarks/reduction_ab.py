"""A/B: single-pass nan-reductions + shared gap areas vs the round-3 code.

Round-4 kernel experiment.  Two arms timed IN ONE PROCESS (tunnel health
varies ±30% across runs — CLAUDE.md discipline):

  old — the round-3 formulation, monkeypatched in: nanmax/nanmin with a
        second ``jnp.any(mask)`` reduction, and cape_cin_base running the
        full trapz arithmetic twice on NaN-masked track copies.
  new — the library as imported: nanmax/nanmin detect the all-invalid case
        from the ±inf fill surviving the single reduction (finite-or-NaN
        input contract), and cape_cin_base computes gap areas once and
        selects the CAPE/CIN windows at gap granularity.

The fused kernel's ~30 level-axis reductions dominate its op mix (CLAUDE.md
round-3 perf notes), and every nanmax/nanmin paid two of them.

RESULT (v5e, B=2^19, two runs with arm order swapped): TIMING-NEUTRAL.
Whichever arm runs FIRST in the process wins (~59-62 ms) and the second
loses (~65 ms) — a systematic ~5 ms (~8%) second-arm penalty that dwarfs
any difference between the formulations.  Checksums bitwise-identical both
runs.  The new code is kept for the smaller op count and simpler dataflow,
not for measured speed.  Future in-process A/Bs must either interleave
timing rounds or swap arm order across two runs.

Usage: python benchmarks/reduction_ab.py [arm arm]   (repo root, TPU)
"""

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402  (timing + backend-probe helpers)
from xarray_parcel_tpu import adiabat, cape, fused  # noqa: E402
from xarray_parcel_tpu.ops import _axis, interp, levels  # noqa: E402
from xarray_parcel_tpu.ops import integrate as integ  # noqa: E402
from xarray_parcel_tpu.ops.safe import safe_log  # noqa: E402

B = 1 << 19


# --- the round-3 implementations, verbatim ---

def old_nanmax(x, where=None, axis=-1):
    m = ~jnp.isnan(x)
    if where is not None:
        m = m & where
    r = jnp.max(jnp.where(m, x, -jnp.inf), axis=axis)
    return jnp.where(jnp.any(m, axis=axis), r, jnp.nan)


def old_nanmin(x, where=None, axis=-1):
    m = ~jnp.isnan(x)
    if where is not None:
        m = m & where
    r = jnp.min(jnp.where(m, x, jnp.inf), axis=axis)
    return jnp.where(jnp.any(m, axis=axis), r, jnp.nan)


def old_trapz(y, x, mask=None, only_positive=False, only_negative=False,
              axis=-1):
    lo, hi = _axis.edge_slicers(axis)
    y0, y1 = lo(y), hi(y)
    x0, x1 = lo(x), hi(x)
    valid = ~(jnp.isnan(y0) | jnp.isnan(y1) | jnp.isnan(x0) | jnp.isnan(x1))
    dx = jnp.abs(jnp.where(valid, x1 - x0, 0.0))
    means = 0.5 * (jnp.where(valid, y0, 0.0) + jnp.where(valid, y1, 0.0))
    areas = dx * means
    sel = valid if mask is None else (valid & mask)
    if only_positive:
        sel = sel & (areas > 0)
    if only_negative:
        sel = sel & (areas < 0)
    return jnp.sum(jnp.where(sel, areas, 0.0), axis=axis)


def old_cape_cin_base(pressure, temperature, lfc_pressure, el_pressure,
                      parcel_temperature, pos_cape_neg_cin=True,
                      post_zero_cin=False, intersections=None,
                      log_pressure=None, log_lfc_pressure=None,
                      log_el_pressure=None, axis=-1, **unused_kwargs):
    ex = _axis.expander(axis)
    p = jnp.asarray(pressure)
    t = jnp.asarray(temperature)
    pt = jnp.asarray(parcel_temperature)
    p, t, pt = jnp.broadcast_arrays(p, t, pt)
    log_p = log_pressure if log_pressure is not None else safe_log(p)
    lfc_lp = ex(jnp.asarray(log_lfc_pressure)
                if log_lfc_pressure is not None
                else safe_log(lfc_pressure))
    el = (jnp.asarray(log_el_pressure) if log_el_pressure is not None
          else safe_log(el_pressure))
    el_lp = ex(jnp.where(jnp.isnan(el), old_nanmin(log_p, axis=axis), el))
    diff = pt - t
    areas, gap_mask = integ.trap_around_zeros(
        p, diff, log_x=True, start=0, intersections=intersections,
        log_x_values=log_pressure, axis=axis)
    area_x = areas['x']
    area = areas['area']
    in_cape = (log_p <= lfc_lp) & (log_p >= el_lp)
    diff_cape = jnp.where(in_cape, diff, jnp.nan)
    lp_cape = jnp.where(in_cape, log_p, jnp.nan)
    a_cape = (area_x <= lfc_lp) & (area_x >= el_lp)
    if pos_cape_neg_cin:
        a_cape = a_cape & (area > 0)
    from xarray_parcel_tpu import constants as c
    from xarray_parcel_tpu.ops import nansum
    cape_v = c.Rd * old_trapz(diff_cape, lp_cape, mask=gap_mask,
                              only_positive=pos_cape_neg_cin, axis=axis)
    cape_v = cape_v + c.Rd * nansum(area, where=a_cape, axis=axis)
    in_cin = log_p >= lfc_lp
    diff_cin = jnp.where(in_cin, diff, jnp.nan)
    lp_cin = jnp.where(in_cin, log_p, jnp.nan)
    a_cin = area_x >= lfc_lp
    if pos_cape_neg_cin:
        a_cin = a_cin & (area < 0)
    cin = c.Rd * old_trapz(diff_cin, lp_cin, mask=gap_mask,
                           only_negative=pos_cape_neg_cin, axis=axis)
    cin = cin + c.Rd * nansum(area, where=a_cin, axis=axis)
    if post_zero_cin:
        cin = jnp.where(cin <= 0, cin, 0.0)
    return {'cape': cape_v, 'cin': cin}


NEW = {}
PATCH_POINTS = [(interp, 'nanmax'), (interp, 'nanmin'),
                (levels, 'nanmax'), (levels, 'nanmin'),
                (cape, 'nanmax'), (cape, 'nanmin'),
                (cape, 'cape_cin_base'), (fused, 'cape_cin_base')]


def set_arm(old):
    for mod, name in PATCH_POINTS:
        if old:
            repl = {'nanmax': old_nanmax, 'nanmin': old_nanmin,
                    'cape_cin_base': old_cape_cin_base}[name]
            setattr(mod, name, repl)
        else:
            setattr(mod, name, NEW[(id(mod), name)])
    fused._diff_core.cache_clear()


def main():
    bench.wait_for_backend()
    for mod, name in PATCH_POINTS:
        NEW[(id(mod), name)] = getattr(mod, name)

    bench.log(f'backend={jax.default_backend()}')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)

    p, t, td = (jnp.asarray(v) for v in
                __import__('__graft_entry__')._synthetic_columns((B,)))

    results = {}
    checks = {}
    for arm in (sys.argv[1:] or ('old', 'new')):
        set_arm(old=arm == 'old')

        def sb(p, t, td):
            res, _ = fused.fused_surface_cape_cin(p, t, td, tables=tables)
            return res['cape'], res['cin']

        fn = jax.jit(sb)
        sec = bench.time_fn(fn, p, t, td)
        results[arm] = sec
        out = fn(p, t, td)
        checks[arm] = (float(jnp.nansum(out[0])), float(jnp.nansum(out[1])),
                       int(jnp.sum(jnp.isnan(out[0]))))
        bench.log(f'{arm}: {sec * 1e3:.1f} ms/iter '
                  f'({B / sec:.4g} cols/s)  checksum={checks[arm]}')
    set_arm(old=False)

    # Same summands in the same tree shape, but XLA may reassociate across
    # program variants — require agreement to fp32 roundoff, not bitwise.
    for i in (0, 1):
        rel = abs(checks['old'][i] - checks['new'][i]) / (
            abs(checks['old'][i]) + 1e-9)
        assert rel < 1e-6, ('arms disagree: ' + repr(checks))
    assert checks['old'][2] == checks['new'][2], repr(checks)
    print(json.dumps({
        'old_ms': round(results['old'] * 1e3, 2),
        'new_ms': round(results['new'] * 1e3, 2),
        'speedup': round(results['old'] / results['new'], 4),
        'old_cols_per_sec': round(B / results['old'], 1),
        'new_cols_per_sec': round(B / results['new'], 1),
        'checksums_equal': True, 'batch': B,
    }))


if __name__ == '__main__':
    main()
