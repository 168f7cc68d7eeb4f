"""Float32 accuracy gate: the BASELINE.md posterior max-abs-diff metric.

Measures, at whole-genome production scale (N~6000 segments, S=355 states,
M=3 clones, 300 breakpoints — the shapes of bench.py), how far the float32
production engine strays from float64 semantics:

  --oracle       f32 JAX engine vs the float64 numpy oracle
                 (models/oracle.py, the reference-semantics spec), both
                 running the same VI sweeps from identical initialization.
                 Reports posterior max-abs-diff per sweep.  This is the
                 direct float32-vs-reference number: the oracle is parity-
                 tested against brute-force enumeration and the f64 engine
                 (tests/test_oracle.py, tests/test_engine_parity.py).
  --em           f32 vs f64 JAX engine over the FULL production fit
                 (5 EM x 5 VI, fused h + likelihood-param updates) —
                 the end-to-end dtype sensitivity of the whole pipeline.
  --pallas       f32 Pallas kernel path vs f32 lax.scan path on the
                 current backend (run on TPU for the production kernel).

Results append to ACCURACY.json at the repo root.  Run on CPU:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/accuracy_gate.py --oracle --em
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# a real float64 engine needs x64 enabled before any jax import; the f32
# path is unaffected (the engine picks dtypes explicitly via spec.dtype)
import jax
jax.config.update('jax_enable_x64', True)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS_FILE = os.path.join(REPO_ROOT, 'ACCURACY.json')


def make_problem(N=6000, num_events=300, seed=0, dtype_name='float32'):
    """The bench.py whole-genome problem: returns (model, spec, params, state)."""
    import jax.numpy as jnp
    from remixt_tpu.simulations import simple as sim
    from remixt_tpu.models.fit import BreakpointModel

    dtype = {'float32': jnp.float32, 'float64': jnp.float64}[dtype_name]
    data = sim.simulate_experiment(
        N=N, M=3, h=(0.08, 0.05, 0.025), cn_max=12,
        num_events=num_events, seed=seed,
        num_chains=max(1, int(round(N / 260))))
    model = BreakpointModel(
        data['x'], data['l'], data['adjacencies'], data['breakpoints'],
        max_copy_number=12, max_depth=1e9,
        min_segment_length=1.0, min_proportion_genotyped=0.0,
        divergence_weight=1e-7, dtype=dtype, random_seed=1234)
    model.num_em_iter = 5
    model.num_update_iter = 5
    return model, data


def build_oracle_for(model, h_init):
    """Float64 oracle over the model's (remapped) problem arrays."""
    from remixt_tpu.models.oracle import OracleModel
    from remixt_tpu.models import states as states_mod

    M = len(h_init)
    cn_states_one = states_mod.enumerate_cn_states(
        M, 2, model.max_copy_number, model.max_copy_number_diff)
    cn_states = np.tile(cn_states_one[None], (model.N, 1, 1, 1))
    cn_states[:, :, 0, :] = model.normal_copies[:, None, :]
    cn_states = cn_states[model.seg_rev_remap]
    brk_states = states_mod.enumerate_brk_states(
        M, model.max_copy_number, model.max_copy_number_diff)

    return OracleModel(
        num_clones=M,
        num_segments=model.N1,
        num_breakpoints=model.num_breakpoints,
        normal_contamination=model.normal_contamination,
        cn_states=cn_states,
        brk_states=brk_states,
        h_init=np.asarray(h_init, dtype=float),
        l=model.l1,
        x=model.x1[:, 2],
        y=model.x1[:, 0:2],
        is_telomere=model.is_telomere,
        breakpoint_idx=model.breakpoint_idx,
        breakpoint_orient=model.breakpoint_orient,
        transition_penalty=model.transition_log_prob,
        divergence_weight=model.divergence_weight,
    )


def max_abs_diff(a, b):
    return float(np.max(np.abs(np.asarray(a, dtype=np.float64)
                               - np.asarray(b, dtype=np.float64))))


def gate_oracle(N, num_sweeps=5, seed=0, dtype_name='float32'):
    """Engine VI sweeps vs float64 oracle VI sweeps."""
    import jax

    model, data = make_problem(N=N, seed=seed, dtype_name=dtype_name)
    h_init = data['h']

    spec = model._build_spec(len(h_init))
    params = spec.init_params(
        h_init, model.divergence_weight,
        total_mask=model._total_likelihood_mask.astype(float),
        allele_mask=model._allele_likelihood_mask.astype(float))
    state = spec.init_state()

    oracle = build_oracle_for(model, h_init)
    oracle.total_likelihood_mask = (
        model._total_likelihood_mask.astype(np.int64))
    oracle.allele_likelihood_mask = (
        model._allele_likelihood_mask.astype(np.int64))

    per_sweep = []
    for sweep in range(num_sweeps):
        t0 = time.time()
        oracle.update_p_allele_swap()
        oracle.update_p_cn()
        oracle.update_p_breakpoint()
        oracle.update_p_outlier_total()
        oracle.update_p_outlier_allele()
        state = spec.sweep(params, state)
        jax.block_until_ready(state)

        marg = np.asarray(state.posterior_marginals, dtype=np.float64)
        diffs = {
            'posterior_max_abs_diff': max_abs_diff(
                marg, oracle.posterior_marginals),
            'posterior_mean_abs_diff': float(np.mean(np.abs(
                marg - oracle.posterior_marginals))),
            # a large max-abs-diff on near-tied states is harmless iff the
            # decoded state agrees; this is the operative fraction
            'posterior_argmax_disagreement': float(np.mean(
                marg.argmax(axis=1)
                != oracle.posterior_marginals.argmax(axis=1))),
            'p_breakpoint_max_abs_diff': max_abs_diff(
                state.p_breakpoint, oracle.p_breakpoint)
            if spec.K > 0 else 0.0,
            'p_outlier_total_max_abs_diff': max_abs_diff(
                state.p_outlier_total, oracle.p_outlier_total),
            'log_norm_rel_diff': abs(
                float(state.hmm_log_norm_const) - oracle.hmm_log_norm_const
            ) / abs(oracle.hmm_log_norm_const),
            'seconds': round(time.time() - t0, 1),
        }
        per_sweep.append(diffs)
        print('sweep {}: {}'.format(sweep, json.dumps(diffs)), flush=True)

    return {
        'gate': '{}_engine_vs_f64_oracle'.format(dtype_name),
        'N': int(spec.N), 'S': int(spec.S), 'M': int(len(h_init)),
        'K': int(spec.K), 'num_sweeps': num_sweeps,
        'posterior_max_abs_diff': max(
            d['posterior_max_abs_diff'] for d in per_sweep),
        'per_sweep': per_sweep,
    }


def gate_em(N, seed=0):
    """f32 vs f64 full production fit (5 EM x 5 VI + EM updates)."""
    results = {}
    for dtype_name in ('float64', 'float32'):
        model, data = make_problem(N=N, seed=seed, dtype_name=dtype_name)
        t0 = time.time()
        model.fit(data['h'])
        results[dtype_name] = {
            'model': model,
            'seconds': time.time() - t0,
        }

    m32 = results['float32']['model']
    m64 = results['float64']['model']
    out = {
        'gate': 'f32_vs_f64_full_fit',
        'N': int(m32.spec.N), 'S': int(m32.spec.S),
        'num_em_iter': m32.num_em_iter, 'num_update_iter': m32.num_update_iter,
        'posterior_max_abs_diff': max_abs_diff(
            m32.state.posterior_marginals, m64.state.posterior_marginals),
        'p_breakpoint_max_abs_diff': max_abs_diff(
            m32.state.p_breakpoint, m64.state.p_breakpoint),
        'h_max_rel_diff': float(np.max(
            np.abs(np.asarray(m32.h) - np.asarray(m64.h))
            / np.abs(np.asarray(m64.h)))),
        'elbo_rel_diff': abs(m32.prev_elbo - m64.prev_elbo) / abs(m64.prev_elbo),
        'f32_fit_seconds': round(results['float32']['seconds'], 1),
        'f64_fit_seconds': round(results['float64']['seconds'], 1),
    }
    # the decode must agree where posteriors are confident
    cn32, _ = m32.optimal_cn()
    cn64, _ = m64.optimal_cn()
    out['decode_disagreement_fraction'] = float(
        np.mean(np.any(cn32 != cn64, axis=(1, 2))))
    return out


def gate_pallas(N, num_sweeps=5, seed=0, interpret=False):
    """f32 Pallas kernel path vs f32 lax.scan path, same sweeps.

    Must run WITHOUT global x64 (this tool enables it for the oracle
    gates): spawn via --pallas-subprocess, or read the identical
    measurement bench.py records in BENCH_DETAIL.json on every TPU run.
    """
    import jax

    if jax.config.jax_enable_x64 and not interpret:
        raise SystemExit(
            'the pallas gate needs an x64-free process (Mosaic rejects i64 '
            'DMA indices); run `python bench.py` (records pallas_vs_scan in '
            'BENCH_DETAIL.json) or use --interpret at reduced --n')

    model, data = make_problem(N=N, seed=seed, dtype_name='float32')
    h_init = data['h']
    spec = model._build_spec(len(h_init))
    params = spec.init_params(
        h_init, model.divergence_weight,
        total_mask=model._total_likelihood_mask.astype(float),
        allele_mask=model._allele_likelihood_mask.astype(float))

    backend = jax.default_backend()
    if backend == 'cpu' and not interpret:
        raise SystemExit(
            '--pallas needs a TPU backend (or --interpret for the emulated '
            'kernel, which is slow at production N)')

    states = {}
    for use_pallas in (False, True):
        spec.use_pallas = use_pallas
        state = spec.init_state()
        # fresh jit cache per path so the sweep retraces with the new flag
        spec._jit_cache = {}
        for _ in range(num_sweeps):
            state = spec.sweep(params, state)
        jax.block_until_ready(state)
        states[use_pallas] = state

    return {
        'gate': 'pallas_vs_scan_f32',
        'backend': backend,
        'N': int(spec.N), 'S': int(spec.S), 'num_sweeps': num_sweeps,
        'posterior_max_abs_diff': max_abs_diff(
            states[True].posterior_marginals,
            states[False].posterior_marginals),
        'p_breakpoint_max_abs_diff': max_abs_diff(
            states[True].p_breakpoint, states[False].p_breakpoint),
        'log_norm_rel_diff': abs(
            float(states[True].hmm_log_norm_const)
            - float(states[False].hmm_log_norm_const)
        ) / abs(float(states[False].hmm_log_norm_const)),
    }


def append_results(entries):
    existing = []
    if os.path.exists(RESULTS_FILE):
        with open(RESULTS_FILE) as f:
            existing = json.load(f)
    existing.extend(entries)
    with open(RESULTS_FILE, 'w') as f:
        json.dump(existing, f, indent=2)
    print('wrote {} entries to {}'.format(len(entries), RESULTS_FILE))


# Thresholds the f32-vs-oracle gate must stay under (settled sweeps).
# posterior: near-tied states legitimately move ~1e-2 in f32 (mean ~1e-7);
# p_outlier: the round-3 5e-2 plateau was the component-dependent lgamma
# rounding fixed by ops.special.lgamma_shift — measured 1e-3-scale after,
# and growth past 1e-2 means the cancellation-free emission forms
# regressed.
ORACLE_GATE_THRESHOLDS = {
    'posterior_max_abs_diff': 5e-2,
    'posterior_argmax_disagreement': 1e-2,
    'p_outlier_total_max_abs_diff': 1e-2,
}


def check_thresholds(entry):
    """Exit-code enforcement of the f32 oracle-gate thresholds (settled
    state: the LAST sweep's diffs)."""
    if entry.get('gate') != 'float32_engine_vs_f64_oracle':
        return []
    last = entry['per_sweep'][-1]
    failures = []
    for metric, bound in ORACLE_GATE_THRESHOLDS.items():
        if last.get(metric, 0.0) > bound:
            failures.append('{} = {:.3e} exceeds {:.0e}'.format(
                metric, last[metric], bound))
    return failures


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--oracle', action='store_true')
    parser.add_argument('--em', action='store_true')
    parser.add_argument('--pallas', action='store_true')
    parser.add_argument('--interpret', action='store_true',
                        help='run the pallas gate with the emulated kernel')
    parser.add_argument('--n', type=int, default=6000)
    parser.add_argument('--sweeps', type=int, default=5)
    parser.add_argument('--seed', type=int, default=0)
    parser.add_argument('--dtype', default='float32',
                        choices=('float32', 'float64'))
    parser.add_argument('--no-write', action='store_true')
    args = parser.parse_args()

    entries = []
    if args.oracle:
        entries.append(gate_oracle(args.n, num_sweeps=args.sweeps,
                                   seed=args.seed, dtype_name=args.dtype))
    if args.em:
        entries.append(gate_em(args.n, seed=args.seed))
    if args.pallas:
        entries.append(gate_pallas(args.n, num_sweeps=args.sweeps,
                                   seed=args.seed, interpret=args.interpret))

    for entry in entries:
        print(json.dumps(entry, indent=2))
    if entries and not args.no_write:
        append_results(entries)

    failures = [f for entry in entries for f in check_thresholds(entry)]
    if failures:
        print('GATE FAILURES:\n  ' + '\n  '.join(failures))
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
