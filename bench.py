"""Benchmark driver: whole-genome E-step throughput on one TPU chip.

Problem: hg38-scale segment chain (N=6000 segments at the default 500 kb
grid — defaults.py segment_length), M=3 clones, max_copy_number=12 → S=355
HMM states, 300 breakpoints. One full variational sweep = emission mixing +
forward-backward + breakpoint/outlier/swap updates (the reference's
variational_update, cn_model.py:444-460).

Baseline: the same engine compiled for CPU and pinned to ONE core
(taskset), on an N=512 slice, scaled linearly in N. XLA-CPU on one core is
at least as fast as the reference's single-threaded Cython scalar loops
(the reference has no published numbers — BASELINE.md), so vs_baseline is a
conservative single-chip-vs-single-core speedup.

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

CPU_BASELINE_N = 512
CPU_BASELINE_EVENTS = 26
TPU_N = 6000
TPU_EVENTS = 300


def build_problem(N, num_events, seed=0):
    import jax.numpy as jnp
    from remixt_tpu.simulations import simple as sim
    from remixt_tpu.models.fit import BreakpointModel

    data = sim.simulate_experiment(
        N=N, M=3, h=(0.08, 0.05, 0.025), cn_max=12,
        num_events=num_events, seed=seed,
        num_chains=max(1, int(round(N / 260))))  # hg38-like chromosome count
    model = BreakpointModel(
        data['x'], data['l'], data['adjacencies'], data['breakpoints'],
        max_copy_number=12, max_depth=1e9,
        min_segment_length=1.0, min_proportion_genotyped=0.0,
        divergence_weight=1e-7, dtype=jnp.float32, random_seed=1234)
    spec = model._build_spec(3)
    params = spec.init_params(
        data['h'], 1e-7,
        total_mask=model._total_likelihood_mask.astype(float),
        allele_mask=model._allele_likelihood_mask.astype(float))
    state = spec.init_state()
    return spec, params, state


def time_sweep(N, num_events, iters, repeats=3):
    import jax
    spec, params, state = build_problem(N, num_events)

    state = spec.sweep(params, state)  # compile
    jax.block_until_ready(state)

    # median of repeated timing loops: tunnel/device conditions vary
    times = []
    for _ in range(repeats):
        t0 = time.time()
        for _ in range(iters):
            state = spec.sweep(params, state)
        jax.block_until_ready(state)
        times.append((time.time() - t0) / iters)
    dt = sorted(times)[len(times) // 2]
    assert np.isfinite(float(state.hmm_log_norm_const))
    return spec.N / dt


def run_cpu_baseline():
    """Run this script's --cpu-baseline mode on one pinned CPU core."""
    env = dict(os.environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_cpu_multi_thread_eigen=false'
    env['OMP_NUM_THREADS'] = '1'
    env['OPENBLAS_NUM_THREADS'] = '1'
    cmd = ['taskset', '-c', '0', sys.executable, os.path.abspath(__file__),
           '--cpu-baseline']
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    for line in out.stdout.splitlines():
        if line.startswith('CPU_BASELINE'):
            return float(line.split()[1])
    raise RuntimeError('cpu baseline failed:\n' + out.stdout + out.stderr)


def main():
    if '--cpu-baseline' in sys.argv:
        segs = time_sweep(CPU_BASELINE_N, CPU_BASELINE_EVENTS, iters=2)
        print('CPU_BASELINE {:.3f}'.format(segs), flush=True)
        return 0

    tpu_segs_per_s = time_sweep(TPU_N, TPU_EVENTS, iters=5)
    cpu_segs_per_s = run_cpu_baseline()
    result = {
        'metric': 'e_step_segments_per_s_per_chip',
        'value': round(tpu_segs_per_s, 1),
        'unit': 'segments/s (whole-genome VI sweep, N~6029 S=355 M=3 K=300, 23 chains, f32; '
                'baseline = same engine on 1 CPU core)',
        'vs_baseline': round(tpu_segs_per_s / cpu_segs_per_s, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == '__main__':
    sys.exit(main())
