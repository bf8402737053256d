"""Static op-mix census of the fused CAPE solve's column program.

Traces `fused._column_outputs` (the exact program the Pallas kernel body
and its XLA twin execute) on one (TB, L) block and buckets every jaxpr
primitive by class (vector arithmetic / reduction / layout) and output
shape.  Pure CPU-side tracing — no device needed — so it gives a
deterministic denominator for time-share estimates like
`benchmarks/clenshaw_share.py` (which measures the Clenshaw share on the
real chip): Clenshaw's op count is known exactly (K-1 iterations of one
mul + one add + one sub on the full block, plus the argument prep), so

    clenshaw_ops / total_vector_arith_ops

bounds what any spectral-evaluation optimisation can buy if per-op cost
were uniform; the TPU A/B measures how non-uniform it actually is.

The census also emits a VPU issue-rate roofline: every vector op on a
(sublanes, lanes) block costs ceil(sublanes/8) * ceil(lanes/128) vector
registers, and the v5e VPU issues ~1 vreg-op/cycle at ~940 MHz, so

    blocks * vregs_per_block / clock

predicts kernel-only time if the kernel is issue-bound.  Round-4
calibration: at 2^19 columns the rows-layout kernel measured 59.4 ms;
the census predicts 47.4 ms counting arithmetic+reductions only and
65.8 ms counting layout ops too — the kernel runs at 0.9-1.25x the
issue-rate speed of light, which is why kernel time is flat in L
(64/90/127 all pad to 128 lanes), TB-invariant, and why each removed
vector op is worth ~0.1%% (op-count reduction is the only lever left).

Run anywhere:  python benchmarks/op_mix.py
Prints one JSON line.
"""

import collections
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

TB = 256
L = 90

ARITH = {
    'mul', 'sub', 'add', 'div', 'exp', 'log', 'pow', 'integer_pow', 'sqrt',
    'rsqrt', 'neg', 'max', 'min', 'abs', 'sign', 'select_n', 'clamp',
    'ne', 'eq', 'ge', 'gt', 'lt', 'le', 'and', 'or', 'not', 'xor',
}
REDUCE = {
    'reduce_sum', 'reduce_max', 'reduce_min', 'reduce_or', 'reduce_and',
    'reduce_prod', 'argmax', 'argmin', 'cumsum', 'cummax', 'cummin',
}
SELECTS = {'select_n'}
COMPARES = {'ne', 'eq', 'ge', 'gt', 'lt', 'le', 'and', 'or', 'not', 'xor'}


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from xarray_parcel_tpu import adiabat, fused

    tables = adiabat.load_moist_adiabat_lookups(dtype=jnp.float32)
    f32 = jnp.float32

    def body(p, t, td, row, scalars):
        return fused._column_outputs(p, t, td, row, scalars, -1, False,
                                     False, dict(tables=tables))

    args = [jnp.zeros((TB, L), f32)] * 4 + [jnp.zeros((TB, 7), f32)]
    jaxpr = jax.make_jaxpr(body)(*args)

    def shape_class(sh):
        # Full-block work: leading TB and a level-like trailing axis
        # (L, L+1 after the LCL splice, or 2L for the crossing-set grid).
        if len(sh) >= 2 and sh[0] == TB and sh[-1] >= L:
            return 'vector'
        if sh in ((TB,), (TB, 1)):
            return 'scalar_col'
        return 'other'

    buckets = collections.Counter()
    prim_counts = collections.Counter()
    vreg_ops = collections.Counter()

    def vregs(sh):
        if not sh:
            return 0.0
        if len(sh) == 1:
            sh = (1,) + tuple(sh)
        sublanes = math.prod(sh[:-1])
        return math.ceil(sublanes / 8) * math.ceil(sh[-1] / 128)

    def walk(jx):
        for eqn in jx.eqns:
            for sub in eqn.params.values():
                if hasattr(sub, 'jaxpr'):
                    walk(sub.jaxpr)
            nm = eqn.primitive.name
            if nm in ('jit', 'pjit', 'closed_call', 'custom_jvp_call',
                      'custom_vjp_call'):
                continue  # counted via recursion
            sh = tuple(getattr(eqn.outvars[0].aval, 'shape', ()))
            cls = ('arith' if nm in ARITH else
                   'reduce' if nm in REDUCE else 'layout')
            buckets[(cls, shape_class(sh))] += 1
            if shape_class(sh) == 'vector':
                prim_counts[nm] += 1
            if cls == 'reduce':
                # A reduction must stream its input, not its output.
                insh = tuple(getattr(eqn.invars[0].aval, 'shape', ()))
                vreg_ops[cls] += vregs(insh)
            else:
                vreg_ops[cls] += vregs(sh)

    walk(jaxpr.jaxpr)

    vec_arith = sum(n for (c, s), n in buckets.items()
                    if c == 'arith' and s == 'vector')
    K = int(tables.coeffs.shape[-1])
    clenshaw_ops = (K - 1) * 3 + 4  # per-iter mul/add/sub + u prep
    CLOCK_HZ = 0.94e9               # v5e core clock, ~1 vreg-op/cycle
    B_CAL, MEASURED_MS = 1 << 19, 59.4   # round-3 kernel-only measurement
    blocks = B_CAL // TB
    core = vreg_ops['arith'] + vreg_ops['reduce']
    everything = sum(vreg_ops.values())
    roofline = {
        'vregs_per_block_arith_reduce': round(core),
        'vregs_per_block_all': round(everything),
        'predicted_ms_2e19_arith_reduce': round(
            blocks * core / CLOCK_HZ * 1e3, 1),
        'predicted_ms_2e19_all_ops': round(
            blocks * everything / CLOCK_HZ * 1e3, 1),
        'measured_ms_2e19_rows': MEASURED_MS,
    }
    out = {
        'block': [TB, L],
        'vector_arith_ops': vec_arith,
        'vector_reductions': sum(
            n for (c, s), n in buckets.items()
            if c == 'reduce'),
        'vector_selects': sum(prim_counts[p] for p in SELECTS),
        'vector_compares_bools': sum(prim_counts[p] for p in COMPARES),
        'vector_layout_ops': sum(
            n for (c, s), n in buckets.items()
            if c == 'layout' and s == 'vector'),
        'scalar_col_ops': sum(n for (c, s), n in buckets.items()
                              if s == 'scalar_col'),
        'k_spectral': K,
        'clenshaw_ops': clenshaw_ops,
        'clenshaw_share_of_vector_arith': round(clenshaw_ops / vec_arith, 4),
        'top_vector_prims': dict(prim_counts.most_common(10)),
        'vpu_issue_roofline': roofline,
    }
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
