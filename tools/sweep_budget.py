"""Per-component wall-clock budget of one VI sweep on the real TPU.

Times each jitted piece of the sweep separately (emissions, frame mix,
forward-backward, breakend bank build, q(brk) update, outlier/swap
updates) so kernel work is attributed before optimizing — the
measured-first discipline behind ABLATION.json / RESTART_SCALING.json.

Usage (TPU host):
    python tools/sweep_budget.py [--n 6000] [--events 300] [--restarts 0]

With --restarts R > 0 the same breakdown runs through the restart-batched
path (grouped Pallas kernel). Writes SWEEP_BUDGET.json at the repo root.

Caveats: standalone dispatches pay forced output layouts and per-call
overhead the fused production blocks don't, so component numbers are
upper bounds and full_sweep (a SINGLE-sweep dispatch) can exceed the
production per-sweep cost substantially — at R=12 the single-sweep jit
compiles a pathological ~140 ms select fusion that the 5-sweep scan
blocks (bench.py's shape, where emissions pin at the scan boundary and
outputs feed the carry) do not exhibit; an emission optimization_barrier
did not remove it. Benchmark truth lives in bench.py; use this tool for
RELATIVE attribution between runs of the same shape.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=6000)
    ap.add_argument('--events', type=int, default=300)
    ap.add_argument('--restarts', type=int, default=0)
    ap.add_argument('--iters', type=int, default=10)
    args = ap.parse_args()

    import jax
    from bench import build_problem
    from remixt_tpu.models import engine as eng

    spec, params, state, _ = build_problem(args.n, args.events)
    R = args.restarts

    if R > 0:
        from remixt_tpu.parallel import restarts as par
        rng = np.random.RandomState(0)
        params = par.stack_pytrees([
            params._replace(h=params.h * (1.0 + 0.2 * rng.rand()))
            for _ in range(R)])
        state = par.stack_pytrees([state] * R)

        emis = jax.jit(lambda p: jax.vmap(
            functools.partial(eng.emission_tensors, spec))(p))
        ll_tot, ll_alle = emis(params)
        sweep1 = jax.jit(functools.partial(
            eng.variational_sweep_restarts, spec))
        state = sweep1(params, state)   # realistic (post-chain) state

        vm = lambda f: jax.vmap(functools.partial(f, spec))
        pieces = {
            'emissions': (emis, (params,)),
            'p_allele_swap': (jax.jit(vm(eng.update_p_allele_swap)),
                              (params, state, ll_alle)),
            'p_cn_chain': (jax.jit(functools.partial(
                eng.update_p_cn_restarts, spec)),
                (params, state, ll_tot, ll_alle)),
            'be_bank': (jax.jit(lambda s: jax.vmap(
                lambda pb: eng.breakend_tmats_exp(
                    spec, pb, pad_S=eng._sweep_exp_bank_pad(spec)))(
                s.p_breakpoint)), (state,)),
            'p_breakpoint': (jax.jit(vm(eng.update_p_breakpoint)),
                             (params, state)),
            'p_outlier_total': (jax.jit(vm(eng.update_p_outlier_total)),
                                (params, state, ll_tot)),
            'p_outlier_allele': (jax.jit(vm(eng.update_p_outlier_allele)),
                                 (params, state, ll_alle)),
            'full_sweep': (sweep1, (params, state)),
        }
    else:
        emis = jax.jit(functools.partial(eng.emission_tensors, spec))
        ll_tot, ll_alle = emis(params)
        state = spec.sweep(params, state)   # realistic (post-chain) state

        pieces = {
            'emissions': (emis, (params,)),
            'p_allele_swap': (jax.jit(functools.partial(
                eng.update_p_allele_swap, spec)),
                (params, state, ll_alle)),
            'p_cn_chain': (jax.jit(functools.partial(
                eng.update_p_cn, spec)),
                (params, state, ll_tot, ll_alle)),
            'be_bank': (jax.jit(lambda s: eng.breakend_tmats_exp(
                spec, s.p_breakpoint,
                pad_S=eng._sweep_exp_bank_pad(spec))), (state,)),
            'p_breakpoint': (jax.jit(functools.partial(
                eng.update_p_breakpoint, spec)), (params, state)),
            'p_outlier_total': (jax.jit(functools.partial(
                eng.update_p_outlier_total, spec)),
                (params, state, ll_tot)),
            'p_outlier_allele': (jax.jit(functools.partial(
                eng.update_p_outlier_allele, spec)),
                (params, state, ll_alle)),
            'full_sweep': (spec.sweep, (params, state)),
        }

    out = {'N': spec.N, 'S': spec.S, 'K': spec.K, 'J': spec.J,
           'Q': spec.Q, 'L': spec.L, 'restarts': R,
           'use_pallas': bool(spec.use_pallas)}
    for name, (fn, fargs) in pieces.items():
        print('timing', name, '...', file=sys.stderr, flush=True)
        out[name + '_ms'] = round(timeit(fn, *fargs, iters=args.iters) * 1e3, 3)

    # emissions amortize over the 5 fused sweeps of a block
    parts = sum(v for k, v in out.items()
                if k.endswith('_ms') and k not in (
                    'full_sweep_ms', 'emissions_ms'))
    out['sum_updates_ms'] = round(parts, 3)
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, 'SWEEP_BUDGET.json'), 'w') as f:
        json.dump(out, f, indent=2)


if __name__ == '__main__':
    main()
