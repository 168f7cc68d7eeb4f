"""Pallas forward-backward kernel parity vs the lax.scan path.

The Pallas kernel (ops/fb_pallas.py) is the production TPU code path
(spec.use_pallas); these tests run it in Pallas interpret mode on CPU so
the shipped kernel logic — VMEM-resident class matrices, the DMA'd
breakend schedule, the reverse-direction column remap — is exercised by
the normal test suite.  This is the naive-vs-optimized discipline of the
reference suite (/root/reference/remixt/tests/test_model.py:58-93)
applied to the kernel: the chain-batched lax.scan implementation
(ops/fb_scan.py, itself oracle-verified in test_engine_parity.py) is the
reference.

Cases cover breakend-heavy chains, several breakends on the same grid
step in different lanes, uneven chain lengths including singleton chains,
and more chains than one sublane tile (Q > 8).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from remixt_tpu.ops import fb_pallas, fb_scan


def exp_pad(be_bank_log, J, Sp, S):
    """exp'd, zero-padded breakend bank in the engine's kernel feed layout
    (engine.breakend_tmats_exp output shape)."""
    out = np.zeros((J,) + (Sp, Sp), dtype=np.float32)
    if J:
        out[:, :S, :S] = np.exp(np.asarray(be_bank_log)[:J])
    return jnp.asarray(out)


def build_problem(seed, chain_lengths, S=7, num_static=5, be_frac=0.25):
    """Random chain-batched FB problem in the engine's bank layout.

    Returns kwargs for both implementations plus the global N.
    """
    rng = np.random.RandomState(seed)
    chain_lengths = np.asarray(chain_lengths)
    Q = len(chain_lengths)
    L = int(chain_lengths.max())
    N = int(chain_lengths.sum())

    framelogprob = -5.0 * rng.rand(N, S)

    # transition banks: log-weights <= 0, bank[0] = zero cut matrix
    static_bank = -3.0 * rng.rand(num_static, S, S)
    static_bank[0] = 0.0

    # chain layout: segments numbered consecutively chain by chain
    chain_seg_map = np.full((Q, L), N, dtype=np.int32)
    offset = 0
    for q, length in enumerate(chain_lengths):
        chain_seg_map[q, :length] = np.arange(offset, offset + length)
        offset += length

    # per-pair bank indices: mostly static classes, a sample of breakends
    chain_bank_idx = np.zeros((Q, max(L - 1, 1)), dtype=np.int32)
    be_positions = []
    for q, length in enumerate(chain_lengths):
        for t in range(length - 1):
            if rng.rand() < be_frac:
                be_positions.append((q, t))
            else:
                chain_bank_idx[q, t] = rng.randint(num_static)
    J = len(be_positions)
    be_bank = -3.0 * rng.rand(max(J, 1), S, S)
    for j, (q, t) in enumerate(be_positions):
        chain_bank_idx[q, t] = num_static + j

    chain_last = (chain_lengths - 1).astype(np.int32)

    plan = fb_pallas.build_pallas_plan(
        chain_bank_idx, num_static, Q, L, S)

    return dict(
        framelogprob=jnp.asarray(framelogprob, dtype=jnp.float32),
        static_bank=jnp.asarray(static_bank, dtype=jnp.float32),
        be_bank=jnp.asarray(be_bank[:max(J, 1)], dtype=jnp.float32),
        be_exp_pad=exp_pad(be_bank, J, plan['Sp'], S),
        full_bank=jnp.asarray(
            np.concatenate([static_bank, be_bank[:J]], axis=0)
            if J else static_bank, dtype=jnp.float32),
        chain_bank_idx=jnp.asarray(chain_bank_idx),
        chain_seg_map=jnp.asarray(chain_seg_map),
        chain_last=jnp.asarray(chain_last),
        plan=plan,
        N=N,
        num_breakends=J,
    )


def run_both(problem):
    alphas_ref, betas_ref, log_norm_ref = fb_scan.forward_backward_chains(
        problem['framelogprob'], problem['full_bank'],
        problem['chain_bank_idx'], problem['chain_seg_map'],
        problem['chain_last'])
    alphas, betas, log_norm = fb_pallas.forward_backward_chains_pallas(
        problem['framelogprob'], problem['static_bank'],
        problem['be_exp_pad'],
        problem['chain_seg_map'], problem['chain_last'], problem['plan'],
        interpret=True)
    return ((np.asarray(alphas_ref), np.asarray(betas_ref),
             float(log_norm_ref)),
            (np.asarray(alphas), np.asarray(betas), float(log_norm)))


def assert_parity(problem, atol=2e-4):
    (alphas_ref, betas_ref, log_norm_ref), (alphas, betas, log_norm) = (
        run_both(problem))
    # compare only where messages carry posterior-relevant mass: unreachable
    # states clip to a large negative floor in both implementations but at
    # different constants
    floor = -60.0
    for ref, got in ((alphas_ref, alphas), (betas_ref, betas)):
        significant = ref > (ref.max(axis=-1, keepdims=True) + floor)
        np.testing.assert_allclose(
            got[significant], ref[significant], atol=atol, rtol=1e-5)
    np.testing.assert_allclose(log_norm, log_norm_ref, rtol=1e-5)


def test_single_chain_no_breakends():
    problem = build_problem(0, [12], be_frac=0.0)
    assert problem['num_breakends'] == 0
    assert_parity(problem)


def test_multi_chain_uneven():
    problem = build_problem(1, [9, 4, 13, 1])
    assert_parity(problem)


def test_breakend_heavy():
    problem = build_problem(2, [16, 10], be_frac=0.8)
    assert problem['num_breakends'] > 10
    assert_parity(problem)


def test_same_step_breakends_across_lanes():
    """Several breakends on the same grid column (same t, different
    chains) must each get their own DMA slot (plan kmax > 1)."""
    problem = build_problem(3, [8, 8, 8, 8], be_frac=0.9)
    assert problem['plan']['kmax'] > 1
    assert_parity(problem)


def test_slot_reuse_pipeline_depth_below_kmax(monkeypatch):
    """Columns with more junctions than pipeline slots exercise the
    global-order DMA pipeline's slot reuse (junction g refills slot
    g % num_slots from inside the apply loop) that production depths
    hit but the default-slot tests never reach."""
    monkeypatch.setattr(fb_pallas, 'TILED_NUM_SLOTS', 2)
    problem = build_problem(3, [8, 8, 8, 8], be_frac=0.9)
    assert problem['plan']['kmax'] > 2
    assert_parity(problem)


def test_many_chains_pad_tiles():
    """More chains than one 8-row sublane tile plus pad lanes."""
    problem = build_problem(4, [5, 3, 7, 2, 6, 4, 8, 1, 5, 2], be_frac=0.3)
    assert_parity(problem)


def test_log_space_fallback(monkeypatch):
    """The log-space kernels remain selectable (REMIXT_TPU_SCALED_LINEAR=0)
    and parity-equivalent."""
    monkeypatch.setattr(fb_pallas, 'SCALED_LINEAR', False)
    problem = build_problem(6, [10, 5], be_frac=0.4)
    assert_parity(problem)


def test_scaled_scale_column_when_S_is_lane_multiple(monkeypatch):
    """When S is already a lane multiple the scaled kernel must still get a
    pad column for its log-scale channel (plan bumps Sp)."""
    monkeypatch.setattr(fb_pallas, 'SCALED_LINEAR', True)
    problem = build_problem(7, [6, 3], S=128, be_frac=0.3)
    assert problem['plan']['Sp'] == 256
    assert_parity(problem)


def test_posterior_marginals_match():
    """The consumer-level quantity: normalized alpha+beta marginals."""
    problem = build_problem(5, [11, 6, 3], be_frac=0.4)
    (alphas_ref, betas_ref, _), (alphas, betas, _) = run_both(problem)

    def marginals(a, b):
        g = a + b
        g = g - g.max(axis=-1, keepdims=True)
        p = np.exp(g)
        return p / p.sum(axis=-1, keepdims=True)

    np.testing.assert_allclose(
        marginals(alphas, betas), marginals(alphas_ref, betas_ref),
        atol=1e-5)


def test_restart_tiled_kernel_matches_batched_scan():
    """The restart-tiled Pallas kernel (restarts folded into lanes, per-
    restart breakend slots) vs the restart-batched scan, interpret mode."""
    problem = build_problem(9, [12, 7, 4], S=6, be_frac=0.4)
    R = 3
    rng = np.random.RandomState(1)
    S = problem['framelogprob'].shape[-1]
    N = problem['N']
    J = problem['num_breakends']

    frame_b = jnp.asarray(
        -5.0 * rng.rand(R, N, S), dtype=jnp.float32)
    num_static = problem['static_bank'].shape[0]
    be_bank_b = jnp.asarray(-3.0 * rng.rand(R, max(J, 1), S, S),
                            dtype=jnp.float32)

    from remixt_tpu.ops import fb_scan
    scan_plan = fb_scan.build_restart_plan(
        np.asarray(problem['chain_bank_idx']), num_static)
    a_ref, b_ref, ln_ref = fb_scan.forward_backward_chains_restarts(
        frame_b, problem['static_bank'], be_bank_b, scan_plan,
        np.asarray(problem['chain_seg_map']), problem['chain_last'])

    Q, L = problem['chain_seg_map'].shape
    plan = fb_pallas.build_pallas_plan_restarts(
        np.asarray(problem['chain_bank_idx']), num_static, Q, L, S, R, J)
    be_exp_b = jnp.stack([exp_pad(be_bank_b[r], J, plan['Sp'], S)
                          for r in range(R)])
    a, b, ln = fb_pallas.forward_backward_chains_pallas_restarts(
        frame_b, problem['static_bank'], be_exp_b,
        np.asarray(problem['chain_seg_map']), problem['chain_last'], plan,
        interpret=True)

    floor = -60.0
    for ref, got in ((np.asarray(a_ref), np.asarray(a)),
                     (np.asarray(b_ref), np.asarray(b))):
        significant = ref > (ref.max(axis=-1, keepdims=True) + floor)
        np.testing.assert_allclose(
            got[significant], ref[significant], atol=2e-4, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ln), np.asarray(ln_ref), rtol=1e-5)


@pytest.mark.parametrize('fixup_vpu,slots,scaled', [
    (False, 2, True), (True, 2, True), (True, 1, True),
    (True, 2, False)])
def test_grouped_restart_kernel_matches_batched_scan(
        monkeypatch, fixup_vpu, slots, scaled):
    """The grouped restart-tiled kernel (chain-major lanes, one DMA per
    junction delivering all restarts' matrices) vs the restart-batched
    scan, interpret mode — both junction fix-up variants (R serial MXU
    dots vs one batched VPU multiply-reduce) and both double-buffer
    depths."""
    monkeypatch.setattr(fb_pallas, 'GROUPED_FIXUP_VPU', fixup_vpu)
    monkeypatch.setattr(fb_pallas, 'GROUPED_NUM_SLOTS', slots)
    monkeypatch.setattr(fb_pallas, 'SCALED_LINEAR', scaled)
    problem = build_problem(10, [14, 9, 5], S=6, be_frac=0.4)
    R = 3
    rng = np.random.RandomState(2)
    S = problem['framelogprob'].shape[-1]
    N = problem['N']
    J = problem['num_breakends']

    frame_b = jnp.asarray(-5.0 * rng.rand(R, N, S), dtype=jnp.float32)
    num_static = problem['static_bank'].shape[0]
    be_bank_b = jnp.asarray(-3.0 * rng.rand(R, max(J, 1), S, S),
                            dtype=jnp.float32)

    from remixt_tpu.ops import fb_scan
    scan_plan = fb_scan.build_restart_plan(
        np.asarray(problem['chain_bank_idx']), num_static)
    a_ref, b_ref, ln_ref = fb_scan.forward_backward_chains_restarts(
        frame_b, problem['static_bank'], be_bank_b, scan_plan,
        np.asarray(problem['chain_seg_map']), problem['chain_last'])

    Q, L = problem['chain_seg_map'].shape
    plan = fb_pallas.build_pallas_plan_restarts_grouped(
        np.asarray(problem['chain_bank_idx']), num_static, Q, L, S, R, J)
    be_exp_b = jnp.stack([exp_pad(be_bank_b[r], J, plan['Sp'], S)
                          for r in range(R)])
    a, b, ln = fb_pallas.forward_backward_chains_pallas_grouped(
        frame_b, problem['static_bank'], be_exp_b,
        np.asarray(problem['chain_seg_map']), problem['chain_last'], plan,
        interpret=True)

    floor = -60.0
    for ref, got in ((np.asarray(a_ref), np.asarray(a)),
                     (np.asarray(b_ref), np.asarray(b))):
        significant = ref > (ref.max(axis=-1, keepdims=True) + floor)
        np.testing.assert_allclose(
            got[significant], ref[significant], atol=2e-4, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ln), np.asarray(ln_ref), rtol=1e-5)


def test_grouped_kernel_shape_guard():
    """The grouped chain-major kernel runs ONLY at the production wave
    extent; any other restart extent routes to the restart-tiled plan
    (known device faults at some (R, geometry) pairs — VERDICT r4 item 2,
    tools/repro_grouped_fault.py)."""
    from remixt_tpu.models.fit import BreakpointModel
    from remixt_tpu.simulations import simple as sim

    data = sim.simulate_experiment(
        N=30, M=3, h=(0.08, 0.05, 0.025), cn_max=2, num_events=3,
        num_chains=2, seed=3)
    model = BreakpointModel(
        data['x'], data['l'], data['adjacencies'], data['breakpoints'],
        max_copy_number=2, max_depth=1e9, min_segment_length=0.0,
        min_proportion_genotyped=0.0, divergence_weight=1e-7,
        dtype=jnp.float64, random_seed=0)
    spec = model._build_spec(3)

    # default wave comes from defaults.restart_chunk_size
    import remixt_tpu.defaults as defaults
    wave = defaults.restart_chunk_size
    assert spec.pallas_restart_plan(wave).get('grouped', False)
    assert not spec.pallas_restart_plan(wave + 2).get('grouped', False)

    # the batched driver pins the wave to its (padded) chunk size
    spec.pallas_grouped_wave = 4
    spec._pallas_restart_plans = {}
    assert spec.pallas_restart_plan(4).get('grouped', False)
    assert not spec.pallas_restart_plan(wave).get('grouped', False)
