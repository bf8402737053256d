"""Round-6 follow-up: can a different kernel block size unlock 2^22?

megabatch_ab found whole-batch 2^22 fused cape reproducibly crashes the
remote compile helper at the default block_columns=256 (grid = 16384
blocks).  Hypothesis: the grid size, not VMEM, is what kills the
compile.  Probe at 2^22: block_columns=384 (the derived VMEM fit clamps
this to ~300 -> grid ~14k) and TB=128 (grid 32768 — if grid size is the
cause this one must also crash; if it compiles, the cause was elsewhere),
with the 2^21 default arm in-process as the reference.  If a 2^22 arm
compiles and beats 2^21, the headline batch can double again.

RESULT (results/megabatch2_ab_v5e_r6.json): hypothesis REFUTED — both
TB=384 (grid ~14k blocks) and TB=128 (grid 32768 blocks) fail with the
identical HTTP 500 at 2^22, so the grid size is not the trigger; the
compile helper dies on the 2^22 program regardless of block shape
(most likely XLA host-memory pressure while laying out the 4M-column
I/O).  2^21 whole-batch stands as the per-program ceiling on this
chip.  First attempt (megabatch2.log) also showed that keeping a 2^21
slice resident alongside the 2^22 inputs (6.75 GB static) RESOURCE_
EXHAUSTEDs even the null arm — HBM is 16 GB but the working set of a
compiling arm peaks well above its static inputs.

Usage: python benchmarks/megabatch2_ab.py    (repo root, TPU)
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
import bench  # noqa: E402
from xarray_parcel_tpu import adiabat, fused  # noqa: E402

ROUNDS = 2
ITERS = 3


def compile_arm(name, fn, args, results):
    t0 = time.perf_counter()
    for attempt in range(2):
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

    def sb(tb):
        def f(xs):
            res, _ = fused.fused_surface_cape_cin(
                *xs, tables=tables, block_columns=tb)
            return res['cape'], res['cin']
        return f

    # First attempt kept a 2^21 slice resident alongside the 2^22 inputs
    # (6.75 GB static) and even the 2^21 arm RESOURCE_EXHAUSTED — only the
    # 2^22 inputs stay resident now; the 2^21 reference lives in
    # megabatch_ab_v5e_r6.json from its own process.
    B22 = 1 << 22
    cols22 = tuple(jnp.asarray(v) for v in ge._synthetic_columns((B22,)))

    arms = {
        'null': (jax.jit(lambda x: x * 2.0), (cols22[0][:1 << 18, 0],)),
        'cape_4m_tb384': (jax.jit(sb(384)), (cols22,)),
        'cape_4m_tb128': (jax.jit(sb(128)), (cols22,)),
    }
    run_stage(arms, {'cape_4m_tb384': B22, 'cape_4m_tb128': B22}, results)

    null_ms = results.get('null', {}).get('ms')
    print(json.dumps({'rounds': ROUNDS, 'iters': ITERS,
                      'dispatch_floor_ms': null_ms, 'arms': results}))


if __name__ == '__main__':
    main()
