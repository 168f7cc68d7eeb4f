"""Minimal repro / bisect harness for the grouped-kernel device fault.

RESTART_SCALING.json records a reproducible TPU device fault when the
grouped restart-tiled Pallas kernel runs at R=10 on the bench problem
(and at an R=4 tail chunk on a benchmark sim); R=8/12/16 run clean.
Production routes around it by padding every chunk to
``restart_chunk_size`` — this tool exists to find the actual defect.

It strips the sweep away and drives the layers one at a time, innermost
first, so the first faulting stage localizes the bug:

  stage ``kernel``     just forward_backward_chains_pallas_grouped on a
                       synthetic frame/bank at the bench lane geometry
  stage ``chain``      the full chain update (bank build + kernel +
                       marginals) via engine.update_p_cn_restarts
  stage ``sweep``      one full restart-batched VI sweep

Bisect knobs (read by ops/fb_pallas.py at import — set BEFORE running):
  REMIXT_TPU_FIXUP_VPU=0|1     batched VPU fix-up vs R serial MXU dots
  REMIXT_TPU_GROUPED_SLOTS=n   junction slab pipeline depth
  REMIXT_TPU_SCALED_LINEAR=0|1 scaled-linear-space kernel variant

Usage (TPU host; each invocation is one fresh process — a faulted chip
holds its claim for minutes, so probe one configuration per process):
    python tools/repro_grouped_fault.py --r 10 --stage kernel
    REMIXT_TPU_FIXUP_VPU=0 python tools/repro_grouped_fault.py --r 10
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--r', type=int, default=10)
    ap.add_argument('--n', type=int, default=None,
                    help='problem size (default bench.TPU_N)')
    ap.add_argument('--events', type=int, default=None)
    ap.add_argument('--stage', choices=('kernel', 'chain', 'sweep'),
                    default='sweep')
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--guarded', action='store_true',
                    help='leave the production shape guard active '
                         '(spec.pallas_restart_plan routes non-wave '
                         'extents to the tiled kernel) instead of forcing '
                         'the grouped kernel at --r')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import bench
    from remixt_tpu.models import engine as eng
    from remixt_tpu.ops import fb_pallas
    from remixt_tpu.parallel import restarts as par

    N = args.n if args.n is not None else bench.TPU_N
    events = args.events if args.events is not None else bench.TPU_EVENTS
    R = args.r

    spec, params, state, _ = bench.build_problem(N, events)
    if not args.guarded:
        # bisect mode: force the grouped kernel at this extent (the
        # production guard would route non-wave extents to the tiled one)
        spec.pallas_grouped_wave = R
    plan = spec.pallas_restart_plan(R)
    print(json.dumps({
        'R': R, 'N': spec.N, 'S': spec.S, 'Q': spec.Q, 'L': spec.L,
        'J': spec.J, 'Sp': plan['Sp'], 'Qp': plan['Qp'],
        'kmax': plan['kmax'],
        'fixup_vpu': fb_pallas.GROUPED_FIXUP_VPU,
        'slots': fb_pallas.GROUPED_NUM_SLOTS,
        'scaled': fb_pallas.SCALED_LINEAR,
        'static_slot': fb_pallas.GROUPED_STATIC_SLOT,
        'stage': args.stage, 'backend': jax.default_backend()}), flush=True)

    rng = np.random.RandomState(0)
    params_b = par.stack_pytrees(
        [params._replace(h=params.h * (1.0 + 0.2 * rng.rand()))
         for _ in range(R)])
    state_b = par.stack_pytrees([state] * R)

    if args.stage == 'kernel':
        # synthetic frame with realistic magnitudes; real bank geometry.
        # The bank MUST be built inside the jit: holding the multi-GB
        # junction bank live as a jit INPUT faults spuriously
        # (docs/DESIGN.md "Kernels must be validated through the engine
        # path") and confounds the bisect.
        frame_b = jnp.asarray(
            rng.randn(R, spec.N, spec.S) * 5.0 - 20.0, dtype=jnp.float32)

        @jax.jit
        def run(frame_b, p_breakpoint_b):
            be_exp_b = jax.vmap(
                lambda pb: eng.breakend_tmats_exp(
                    spec, pb, pad_S=plan['Sp']))(p_breakpoint_b)
            return fb_pallas.forward_backward_chains_pallas_grouped(
                frame_b, spec.static_bank, be_exp_b,
                np.asarray(spec.chain_seg_map), spec.chain_last, plan)

        out = run(frame_b, state_b.p_breakpoint)
        for _ in range(args.iters - 1):
            out = run(frame_b, state_b.p_breakpoint)
        jax.block_until_ready(out)
        alphas, betas, log_norm = out
        print(json.dumps({'ok': True,
                          'log_norm_sum': float(jnp.sum(log_norm)),
                          'alpha_checksum': float(jnp.sum(
                              jnp.where(jnp.isfinite(alphas), alphas, 0.0)))}),
              flush=True)
        return

    if args.stage == 'chain':
        ll_tot, ll_alle = jax.vmap(
            lambda p: eng.emission_tensors(spec, p))(params_b)

        @jax.jit
        def run(params_b, state_b, ll_tot, ll_alle):
            return eng.update_p_cn_restarts(
                spec, params_b, state_b, ll_tot, ll_alle)

        s = run(params_b, state_b, ll_tot, ll_alle)
        for _ in range(args.iters - 1):
            s = run(params_b, s, ll_tot, ll_alle)
        jax.block_until_ready(s)
        print(json.dumps({'ok': True, 'log_norm_sum': float(
            jnp.sum(s.hmm_log_norm_const))}), flush=True)
        return

    # full restart-batched sweep (the production dispatch that faults)
    import functools
    sweep = jax.jit(functools.partial(eng.variational_sweep_restarts, spec))
    s = sweep(params_b, state_b)
    for _ in range(args.iters - 1):
        s = sweep(params_b, s)
    jax.block_until_ready(s)
    print(json.dumps({'ok': True, 'log_norm_sum': float(
        jnp.sum(s.hmm_log_norm_const))}), flush=True)


if __name__ == '__main__':
    main()
