"""How much of the fused CAPE solve is Chebyshev (Clenshaw) evaluation?

Diagnostic A/B: the production fused kernel with the full piecewise
coefficient table (N_SEG segments x SEG_K=14 terms) vs the SAME kernel
compiled with every segment truncated to SEG_K_TRUNC terms.  The
truncated arm's outputs are physically meaningless — only its timing is
read.  Everything outside `_eval_spectral`'s Clenshaw loop is identical
between the arms, so the rate delta isolates
(SEG_K - SEG_K_TRUNC)/(SEG_K - 1) of the in-kernel Clenshaw cost; scaling
it up gives the full Clenshaw share.  That share bounds the payoff of any
spectral-evaluation optimisation (further splits, truncation, basis
reuse) before building one.

Timing rounds interleave the arms in alternating order to cancel the
~5 ms second-arm bias measured in benchmarks/reduction_ab.py.

Run on the TPU:  python benchmarks/clenshaw_share.py
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

SEG_K_TRUNC = 4
B = 1 << 19
ROUNDS = 8
ITERS = 3


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_columns
    from xarray_parcel_tpu import adiabat, fused
    from xarray_parcel_tpu.utils import sync

    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    tables = jax.tree_util.tree_map(jax.device_put, tables)
    seg_k = adiabat.SEG_K
    # Truncate each SEGMENT's series (keeping the piecewise layout valid):
    # (N, N_SEG*SEG_K) -> (N, N_SEG, SEG_K) -> [:, :, :t] -> flat.
    n = tables.coeffs.shape[0]
    cut = tables.coeffs.reshape(n, adiabat.N_SEG, seg_k)[:, :, :SEG_K_TRUNC]
    trunc = adiabat.AdiabatTables(tables.curves, tables.lookup,
                                  cut.reshape(n, -1))

    p, t, td = (jnp.asarray(v) for v in _synthetic_columns((B,)))
    arms = {
        'full': jax.jit(lambda p, t, td: fused.fused_surface_cape_cin(
            p, t, td, tables=tables)[0]['cape']),
        'trunc': jax.jit(lambda p, t, td: fused.fused_surface_cape_cin(
            p, t, td, tables=trunc)[0]['cape']),
    }
    for name, f in arms.items():
        t0 = time.perf_counter()
        sync(f(p, t, td))
        print(f'{name}: warm/compile {time.perf_counter() - t0:.1f}s',
              file=sys.stderr, flush=True)

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
    delta = sec['full'] - sec['trunc']
    # The piecewise Clenshaw runs seg_k-1 loop iterations (each term costs
    # the same 3 arith + N_SEG-1 selects in both arms); delta covers
    # seg_k - SEG_K_TRUNC of them.
    clenshaw_sec = delta * (seg_k - 1) / (seg_k - SEG_K_TRUNC)
    print(json.dumps({
        'batch': B, 'seg_k_full': seg_k, 'seg_k_trunc': SEG_K_TRUNC,
        'sec_full': round(sec['full'], 6),
        'sec_trunc': round(sec['trunc'], 6),
        'delta_sec': round(delta, 6),
        'clenshaw_sec_est': round(clenshaw_sec, 6),
        'clenshaw_share_of_e2e': round(clenshaw_sec / sec['full'], 4),
    }), flush=True)


if __name__ == '__main__':
    main()
