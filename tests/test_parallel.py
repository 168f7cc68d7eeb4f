"""Device-mesh parallelism tests on the virtual 8-device CPU mesh.

Sharded execution must be numerically equivalent to single-device
execution; the 2D (restart × chain) layout is the production configuration
validated by the driver's multichip dry run.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from remixt_tpu.models import engine as eng
from remixt_tpu.models.fit import BreakpointModel
from remixt_tpu.parallel import restarts as par
from remixt_tpu.parallel import chain as par_chain
from remixt_tpu.simulations import simple as sim


@pytest.fixture(scope='module')
def problem():
    data = sim.simulate_experiment(
        N=48, M=3, h=(0.08, 0.05, 0.025), cn_max=4, num_events=5,
        num_chains=4, seed=3)
    model = BreakpointModel(
        data['x'], data['l'], data['adjacencies'], data['breakpoints'],
        max_copy_number=4, max_depth=1e9, min_segment_length=1.0,
        min_proportion_genotyped=0.0, divergence_weight=1e-7,
        dtype=jnp.float64, random_seed=0)
    spec = model._build_spec(3)
    params = spec.init_params(
        data['h'], 1e-7,
        total_mask=model._total_likelihood_mask.astype(float),
        allele_mask=model._allele_likelihood_mask.astype(float))
    state = spec.init_state()
    return spec, params, state


def test_restart_sharded_sweep_matches(problem):
    spec, params, state = problem
    R = 4

    params_list = [params._replace(h=params.h * (1.0 + 0.05 * i)) for i in range(R)]

    # single-device reference
    expected = [eng.variational_sweep(spec, p, state) for p in params_list]

    mesh = par.make_restart_mesh(jax.devices()[:4])
    params_b = par.shard_restarts(mesh, par.stack_pytrees(params_list))
    state_b = par.shard_restarts(mesh, par.stack_pytrees([state] * R))

    step = par.make_sharded_sweep(spec, mesh)
    with mesh:
        state_out = step(params_b, state_b)

    for i in range(R):
        np.testing.assert_allclose(
            np.asarray(state_out.posterior_marginals[i]),
            np.asarray(expected[i].posterior_marginals), atol=1e-9)
        np.testing.assert_allclose(
            float(state_out.hmm_log_norm_const[i]),
            float(expected[i].hmm_log_norm_const), rtol=1e-9)


def test_2d_mesh_matches_single_device(problem):
    spec, params, state = problem
    n_restart, n_chain = 2, 4
    R = n_restart

    params_list = [params._replace(h=params.h * (1.0 + 0.05 * i)) for i in range(R)]
    spec.chain_constraint = None
    expected_states = [eng.variational_sweep(spec, p, state) for p in params_list]
    expected_ell = [
        float(eng.expected_log_likelihood(spec, p, s))
        for p, s in zip(params_list, expected_states)]

    devices = np.asarray(jax.devices()[:8]).reshape(n_restart, n_chain)
    mesh = Mesh(devices, ('restart', 'chain'))

    params_b = par.shard_restarts(mesh, par.stack_pytrees(params_list))
    state_b = par.shard_restarts(mesh, par.stack_pytrees([state] * R))

    step = par_chain.make_2d_train_step(spec, mesh, h_step=0.0)
    try:
        with mesh:
            params_out, state_out, ell = step(params_b, state_b)

        for i in range(R):
            np.testing.assert_allclose(
                np.asarray(state_out.posterior_marginals[i]),
                np.asarray(expected_states[i].posterior_marginals), atol=1e-9)
            np.testing.assert_allclose(float(ell[i]), expected_ell[i], rtol=1e-9)
            if spec.K > 0:
                np.testing.assert_allclose(
                    np.asarray(state_out.p_breakpoint[i]),
                    np.asarray(expected_states[i].p_breakpoint), atol=1e-9)
    finally:
        spec.chain_constraint = None


def test_factor_devices():
    from remixt_tpu.parallel import distributed

    assert distributed.factor_devices(8, num_restarts=2, num_blocks=2) == (2, 2, 2)
    assert distributed.factor_devices(8, num_restarts=None, num_blocks=None) == (8, 1, 1)
    assert distributed.factor_devices(8, num_restarts=4, num_blocks=1) == (4, 2, 1)
    # prime counts with capped restart/block axes land on the chain axis
    assert distributed.factor_devices(7, num_restarts=2, num_blocks=2) == (1, 7, 1)


def test_make_training_mesh():
    import jax
    from remixt_tpu.parallel import distributed

    mesh = distributed.make_training_mesh(num_restarts=2, num_blocks=2)
    assert mesh.axis_names == ('restart', 'chain', 'block')
    assert mesh.devices.size <= len(jax.devices())


def test_cohort_partition_balanced_and_disjoint():
    from remixt_tpu.parallel import distributed

    samples = ['s{}'.format(i) for i in range(10)]
    shares = [distributed.cohort_partition(samples, pid, 3) for pid in range(3)]
    merged = sorted(sum(shares, []))
    assert merged == sorted(samples)
    sizes = sorted(len(s) for s in shares)
    assert sizes == [3, 3, 4]


def test_restart_batched_sweep_matches_vmap():
    """The dedicated restart-batched sweep (shared static-transition gather
    + scheduled per-restart breakend fix-ups) must reproduce the vmapped
    per-restart sweep exactly."""
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    from remixt_tpu.models import engine as eng
    from remixt_tpu.parallel import restarts as par
    from helpers import make_problem

    prob = make_problem(seed=2, N=18, M=2, cn_max=2, num_breakpoints=3,
                        num_telomeres=2)
    spec = eng.ModelSpec(
        cn_states=prob['cn_states'], brk_states=prob['brk_states'],
        l=prob['l'], x=prob['x'], y=prob['y'],
        is_telomere=prob['is_telomere'],
        breakpoint_idx=prob['breakpoint_idx'],
        breakpoint_orient=prob['breakpoint_orient'],
        transition_penalty=prob['transition_penalty'],
        normal_contamination=prob['normal_contamination'],
        dtype=jnp.float64)

    R = 3
    params_list = [
        spec.init_params(prob['h_init'] * (1.0 + 0.05 * r),
                         prob['divergence_weight'])
        for r in range(R)]
    params_b = par.stack_pytrees(params_list)
    state_b = par.stack_pytrees([spec.init_state()] * R)

    ref = jax.jit(jax.vmap(functools.partial(
        eng.variational_sweep, spec)))(params_b, state_b)
    got = jax.jit(functools.partial(
        eng.variational_sweep_restarts, spec))(params_b, state_b)

    for field in ('posterior_marginals', 'p_breakpoint', 'p_outlier_total',
                  'p_allele_swap', 'hmm_log_norm_const'):
        np.testing.assert_allclose(
            np.asarray(getattr(got, field)), np.asarray(getattr(ref, field)),
            atol=1e-9, err_msg=field)

    # a second sweep exercises the p_breakpoint_used / chain_scale carry
    ref2 = jax.jit(jax.vmap(functools.partial(
        eng.variational_sweep, spec)))(params_b, ref)
    got2 = jax.jit(functools.partial(
        eng.variational_sweep_restarts, spec))(params_b, got)
    np.testing.assert_allclose(
        np.asarray(got2.posterior_marginals),
        np.asarray(ref2.posterior_marginals), atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(got2.p_breakpoint), np.asarray(ref2.p_breakpoint),
        atol=1e-9)


def test_fused_multi_sweep_matches_looped():
    """variational_sweeps (emissions hoisted out of the sweep loop) and
    variational_sweeps_restarts must equal their looped counterparts."""
    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np
    from remixt_tpu.models import engine as eng
    from remixt_tpu.parallel import restarts as par
    from helpers import make_problem

    prob = make_problem(seed=6, N=14, M=2, cn_max=2, num_breakpoints=2,
                        num_telomeres=1)
    spec = eng.ModelSpec(
        cn_states=prob['cn_states'], brk_states=prob['brk_states'],
        l=prob['l'], x=prob['x'], y=prob['y'],
        is_telomere=prob['is_telomere'],
        breakpoint_idx=prob['breakpoint_idx'],
        breakpoint_orient=prob['breakpoint_orient'],
        transition_penalty=prob['transition_penalty'],
        normal_contamination=prob['normal_contamination'],
        dtype=jnp.float64)
    params = spec.init_params(prob['h_init'], prob['divergence_weight'])
    state = spec.init_state()

    looped = state
    for _ in range(3):
        looped = spec.sweep(params, looped)
    fused = spec.sweep_n(3)(params, state)
    np.testing.assert_allclose(
        np.asarray(fused.posterior_marginals),
        np.asarray(looped.posterior_marginals), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(fused.p_breakpoint),
        np.asarray(looped.p_breakpoint), atol=1e-12)

    R = 2
    params_b = par.stack_pytrees(
        [params._replace(h=params.h * (1.0 + 0.1 * r)) for r in range(R)])
    state_b = par.stack_pytrees([state] * R)
    looped_b = state_b
    step = jax.jit(functools.partial(eng.variational_sweep_restarts, spec))
    for _ in range(3):
        looped_b = step(params_b, looped_b)
    fused_b = jax.jit(functools.partial(
        eng.variational_sweeps_restarts, spec, num_sweeps=3))(
            params_b, state_b)
    np.testing.assert_allclose(
        np.asarray(fused_b.posterior_marginals),
        np.asarray(looped_b.posterior_marginals), atol=1e-12)
