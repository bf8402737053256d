"""Whole-batch scaling of the cape arms: how far does dispatch-floor
amortisation carry before compile or HBM gives out?

chunked_ab.py found: fused cape at 2^21 WHOLE-batch compiles fine and
beats the 2^20 headline 1.58e7 vs 1.36e7 cols/s measured — the lax.map
chunked form loses everywhere (~9-18 ms/chunk sequencing overhead), so
the right mega-batch strategy for the CAPE arms is simply a bigger
whole-batch program.  This A/B finds each arm's best batch:

  fused cape: 2^21 vs 2^22 (inputs 4.5 GB at 2^22 — fits)
  XLA cape:   2^20 (current) vs 2^21 — the XLA path's measured rate is
              dispatch-floor-bound (9.97e6 at 2^20, ~32%% floor); 2^21
              should clear the 1e7 north star if its compile holds.

Usage: python benchmarks/megabatch_ab.py    (repo root, TPU)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import adiabat, cape, fused  # noqa: E402

ROUNDS = 2
ITERS = 3


def compile_arm(name, fn, args, results):
    t0 = time.perf_counter()
    for attempt in range(3):
        try:
            bench._materialize(fn(*args))
            bench.log(f'{name}: compiled+first in '
                      f'{time.perf_counter() - t0:.1f}s')
            return True
        except Exception as e:
            bench.log(f'  {name} compile attempt {attempt + 1} failed '
                      f'({str(e)[:100]!r})')
            time.sleep(5)
    results[name] = {'error': 'compile failed'}
    return False


def run_stage(arms, batches, results):
    live = {}
    for name, (fn, args) in arms.items():
        if compile_arm(name, fn, args, results):
            live[name] = (fn, args)
    best = {name: float('inf') for name in live}
    for r in range(ROUNDS):
        for name, (fn, args) in live.items():
            try:
                t0 = time.perf_counter()
                outs = [fn(*args) for _ in range(ITERS)]
                for out in outs:
                    bench._materialize(out)
                sec = (time.perf_counter() - t0) / ITERS
            except Exception as e:
                bench.log(f'round {r} {name} FAILED ({str(e)[:100]!r})')
                continue
            best[name] = min(best[name], sec)
            bench.log(f'round {r} {name}: {sec * 1e3:.1f} ms')
    for name, sec in best.items():
        if sec == float('inf'):
            results[name] = {'error': 'all timing rounds failed'}
            continue
        results[name] = {
            'ms': round(sec * 1e3, 2),
            'batch': batches.get(name),
            'cols_per_sec': (round(batches[name] / sec, 1)
                             if batches.get(name) else None),
        }


def main():
    bench.wait_for_backend()
    bench.log(f'backend={jax.default_backend()}')
    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    jax.block_until_ready(tables.curves)

    results = {}
    ge = __import__('__graft_entry__')

    def sb_fused(xs):
        res, _ = fused.fused_surface_cape_cin(*xs, tables=tables)
        return res['cape'], res['cin']

    def sb_xla(xs):
        res, _ = cape.surface_based_cape_cin(*xs, tables=tables)
        return res['cape'], res['cin']

    # Stage 1: 2^21 for both paths (known-good total from chunked_ab).
    B21 = 1 << 21
    cols21 = tuple(jnp.asarray(v) for v in ge._synthetic_columns((B21,)))
    arms1 = {
        'null': (jax.jit(lambda x: x * 2.0), (cols21[0][:, 0],)),
        'cape_fused_2m': (jax.jit(sb_fused), (cols21,)),
        'cape_xla_2m': (jax.jit(sb_xla), (cols21,)),
    }
    run_stage(arms1, {'cape_fused_2m': B21, 'cape_xla_2m': B21}, results)
    del cols21, arms1

    # Stage 2: 2^22 fused (4.5 GB inputs); XLA intermediates are too fat
    # to risk alongside, so fused only.
    B22 = 1 << 22
    cols22 = tuple(jnp.asarray(v) for v in ge._synthetic_columns((B22,)))
    arms2 = {'cape_fused_4m': (jax.jit(sb_fused), (cols22,))}
    run_stage(arms2, {'cape_fused_4m': B22}, results)

    null_ms = results.get('null', {}).get('ms')
    print(json.dumps({'rounds': ROUNDS, 'iters': ITERS,
                      'dispatch_floor_ms': null_ms, 'arms': results}))


if __name__ == '__main__':
    main()
