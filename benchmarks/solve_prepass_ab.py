"""Share of the fused solve spent in its XLA pre-pass, and whether
stacking the three parcels' pre-passes helps.

Each fused_cape_cin call runs an O(B) XLA pre-pass before the kernel:
the LCL fixed point (50 sequential elementwise iterations), the
backward-ODE curve index (24 RK4 substeps = ~96 sequential cheap ops)
and the coefficient-row blend.  Sequential (B,) ops are latency-ish, so
three solves pay 3x the sequential depth — one stacked (3B,) pre-pass
pays it once.  Arms (interleaved, per-arm minima):

  null     — dispatch floor.
  prepass  — the pre-pass alone (lcl + curve_index + row blend), x3
             parcels sequentially (as the pipeline's three solves do).
  prepass1 — the same three parcels stacked into ONE (3B,) pre-pass.
  solve    — one full fused_cape_cin (pre-pass + kernel) on (B,).

Usage: python benchmarks/solve_prepass_ab.py   (repo root, TPU)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import adiabat, fused  # noqa: E402
from xarray_parcel_tpu.lcl import lcl  # noqa: E402
from xarray_parcel_tpu.ops import notnan  # noqa: E402

B = 1 << 18
ROUNDS = 3
ITERS = 5


def prepass(tables, p0, t0, td0):
    """The scalar pre-pass of fused_cape_cin (fused.py:355-380)."""
    lcls = lcl(p0, t0, td0)
    fidx = adiabat.curve_index_integrate(lcls['lcl_pressure'],
                                         lcls['lcl_temperature'])
    c0 = jnp.clip(jnp.floor(jnp.where(jnp.isnan(fidx), 0.0, fidx)), 0,
                  adiabat.N_CURVES - 2).astype(jnp.int32)
    a = jnp.clip(fidx - c0, 0.0, 1.0)[..., None]
    row = tables.coeffs[c0] * (1.0 - a) + tables.coeffs[c0 + 1] * a
    return jnp.where(notnan(fidx)[..., None], row, jnp.nan), lcls


def main():
    bench.wait_for_backend()
    bench.log(f'backend={jax.default_backend()}')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)

    dat = bench.synthetic(B)
    p = jnp.asarray(dat['pressure'])
    t = jnp.asarray(dat['temperature'])
    from xarray_parcel_tpu import thermo
    td = jax.jit(thermo.dewpoint_from_specific_humidity)(
        p, t, jnp.asarray(dat['specific_humidity']))
    jax.block_until_ready(td)
    p0, t0, td0 = p[:, 0], t[:, 0], td[:, 0]

    def three(p0, t0, td0):
        # Three parcel variants' pre-passes, sequentially (as the three
        # pipeline solves run them) — slightly perturbed states so XLA
        # cannot CSE them into one.
        outs = []
        for dp in (0.0, 1.0, 2.0):
            outs.append(prepass(tables, p0 - dp, t0, td0))
        return outs

    def one_stacked(p0, t0, td0):
        ps = jnp.concatenate([p0 - 0.0, p0 - 1.0, p0 - 2.0])
        ts = jnp.concatenate([t0, t0, t0])
        tds = jnp.concatenate([td0, td0, td0])
        return prepass(tables, ps, ts, tds)

    arms = {
        'null': (jax.jit(lambda x: x * 2.0), (p0,)),
        'prepass': (jax.jit(three), (p0, t0, td0)),
        'prepass1': (jax.jit(one_stacked), (p0, t0, td0)),
        'solve': (jax.jit(lambda p, t, td: fused.fused_cape_cin(
            p, t, td, tables=tables, with_lifted_index=True)), (p, t, td)),
    }

    for name, (fn, args) in arms.items():
        t0_ = time.perf_counter()
        for attempt in range(4):
            try:
                bench._materialize(fn(*args))
                break
            except Exception as e:
                if attempt == 3:
                    raise
                bench.log(f'  {name} compile attempt {attempt + 1} failed '
                          f'({str(e)[:80]!r}); retrying')
                time.sleep(5)
        bench.log(f'{name}: compiled+first in '
                  f'{time.perf_counter() - t0_:.1f}s')

    best = {name: float('inf') for name in arms}
    for r in range(ROUNDS):
        for name, (fn, args) in arms.items():
            t0_ = time.perf_counter()
            outs = [fn(*args) for _ in range(ITERS)]
            for out in outs:
                bench._materialize(out)
            sec = (time.perf_counter() - t0_) / ITERS
            best[name] = min(best[name], sec)
            bench.log(f'round {r} {name}: {sec * 1e3:.1f} ms')

    ms = {k: round(v * 1e3, 2) for k, v in best.items()}
    ms['net_of_floor'] = {k: round(v - ms['null'], 2)
                          for k, v in list(ms.items()) if k != 'null'}
    ms['batch'] = B
    print(json.dumps(ms))


if __name__ == '__main__':
    main()
