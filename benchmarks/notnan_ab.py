"""In-process A/B: one-op notnan (x == x) vs two-op ~isnan masks.

The fused kernel runs at the VPU issue-rate roofline
(benchmarks/op_mix.py), so replacing every ``not(ne(x, x))`` validity
mask with a single ``eq`` removed 42 of 623 vector arithmetic ops
(~6.5% of arith+reduce vregs).  This measures the realised kernel-only
delta by tracing the SAME fused solve twice — once with
``ops.safe._TRACE_TWO_OP`` set (the old two-op masks), once without —
and interleaving timing rounds in alternating order to cancel the ~5 ms
second-arm bias (benchmarks/reduction_ab.py).

Run on the TPU:  python benchmarks/notnan_ab.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

B = 1 << 19
ROUNDS = 8
ITERS = 3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_columns
    from xarray_parcel_tpu import adiabat, fused
    from xarray_parcel_tpu.ops import safe
    from xarray_parcel_tpu.utils import sync

    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    p, t, td = (jnp.asarray(v) for v in _synthetic_columns((B,)))

    def build(two_op):
        safe._TRACE_TWO_OP = two_op
        try:
            f = jax.jit(lambda p, t, td: fused.fused_surface_cape_cin(
                p, t, td, tables=tables)[0]['cape'])
            t0 = time.perf_counter()
            out = f(p, t, td)
            sync(out)
            print(f'two_op={two_op}: warm/compile '
                  f'{time.perf_counter() - t0:.1f}s', file=sys.stderr,
                  flush=True)
            return f, out
        finally:
            safe._TRACE_TWO_OP = False

    f_one, out_one = build(False)
    f_two, out_two = build(True)
    import numpy as np
    bit_equal = bool(np.array_equal(np.asarray(out_one), np.asarray(out_two),
                                    equal_nan=True))

    arms = {'one_op': f_one, 'two_op': f_two}
    total = {name: 0.0 for name in arms}
    for r in range(ROUNDS):
        order = list(arms.items())
        if r % 2:
            order.reverse()
        for name, f in order:
            t0 = time.perf_counter()
            outs = [f(p, t, td) for _ in range(ITERS)]
            for o in outs:
                sync(o)
            total[name] += time.perf_counter() - t0

    sec = {name: v / (ROUNDS * ITERS) for name, v in total.items()}
    print(json.dumps({
        'batch': B,
        'sec_one_op': round(sec['one_op'], 6),
        'sec_two_op': round(sec['two_op'], 6),
        'speedup': round(sec['two_op'] / sec['one_op'], 4),
        'outputs_bit_equal': bit_equal,
    }), flush=True)


if __name__ == '__main__':
    main()
