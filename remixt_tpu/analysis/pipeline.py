"""Fit pipeline: restart enumeration, per-restart fits, solution collation.

Mirrors /root/reference/remixt/analysis/pipeline.py:12-293 — the restart
grid (minor-depth modes × tumour mixture fractions × divergence weights,
ploidy-filtered with a common max depth), the per-restart fit driver, and
collation into the reference's results-HDF5 schema (``stats``,
``solutions/solution_{i}/{cn,brk_cn,h,mix}``) — with restarts fit as a
device-parallel axis instead of separate 32 GB cluster jobs.
"""

import pickle
import itertools

import numpy as np
import pandas as pd

import remixt_tpu.config
import remixt_tpu.analysis.experiment
import remixt_tpu.analysis.readdepth
from remixt_tpu.io.hdf5 import HDFStore
from remixt_tpu.models.fit import BreakpointModel, decode_breakpoints_naive


def init(init_results_filename, experiment_filename, config):
    """Enumerate restart initializations (analysis/pipeline.py:12-109).

    Returns dict of init_id -> params dict (mode_idx, h_normal, h_tumour,
    mix_frac, divergence_weight, max_depth).
    """
    min_ploidy = remixt_tpu.config.get_param(config, 'min_ploidy')
    max_ploidy = remixt_tpu.config.get_param(config, 'max_ploidy')
    h_normal = remixt_tpu.config.get_param(config, 'h_normal')
    h_tumour = remixt_tpu.config.get_param(config, 'h_tumour')
    tumour_mix_fractions = remixt_tpu.config.get_param(config, 'tumour_mix_fractions')
    divergence_weights = remixt_tpu.config.get_param(config, 'divergence_weights')
    max_copy_number = remixt_tpu.config.get_param(config, 'max_copy_number')
    random_seed = config.get('random_seed', 1234)

    with open(experiment_filename, 'rb') as f:
        experiment = pickle.load(f)

    np.random.seed(random_seed)

    read_depth = remixt_tpu.analysis.readdepth.calculate_depth(experiment)
    minor_modes = remixt_tpu.analysis.readdepth.calculate_minor_modes(read_depth)
    init_h_mono = remixt_tpu.analysis.readdepth.calculate_candidate_h_monoclonal(
        minor_modes, h_normal=h_normal, h_tumour=h_tumour)

    init_h_params = []
    ploidy_estimates = []
    max_depths = []
    for mode_idx, h_mono in enumerate(init_h_mono):
        estimated_ploidy = remixt_tpu.analysis.readdepth.estimate_ploidy(h_mono, experiment)
        assert not np.isinf(estimated_ploidy) and not np.isnan(estimated_ploidy)

        max_depth = 2. * h_mono[0] + (max_copy_number + 0.25) * h_mono[1]

        for mix_frac in tumour_mix_fractions:
            init_h_params.append({
                'mode_idx': mode_idx,
                'h_normal': h_mono[0],
                'h_tumour': h_mono[1],
                'mix_frac': mix_frac,
            })
            ploidy_estimates.append(estimated_ploidy)
            max_depths.append(max_depth)

    # ploidy filter, falling back to closest candidate when empty
    def ploidy_filter_dist(ploidy):
        if min_ploidy is not None and ploidy < min_ploidy:
            return min_ploidy - ploidy
        if max_ploidy is not None and ploidy > max_ploidy:
            return ploidy - max_ploidy
        return 0.

    is_ploidy_filtered = [ploidy_filter_dist(a) == 0. for a in ploidy_estimates]
    if not any(is_ploidy_filtered):
        ploidy_dists = [ploidy_filter_dist(a) for a in ploidy_estimates]
        is_ploidy_filtered = [a == min(ploidy_dists) for a in ploidy_dists]

    init_h_params = [a for i, a in enumerate(init_h_params) if is_ploidy_filtered[i]]
    max_depths = [a for i, a in enumerate(max_depths) if is_ploidy_filtered[i]]

    # common max depth so objectives are comparable across inits
    max_depth = min(max_depths)

    depth = experiment.x[:, 2] / experiment.l
    proportion_below_max_depth = (
        np.sum((depth <= max_depth) * experiment.l) / np.sum(experiment.l))
    if proportion_below_max_depth < 0.75:
        raise ValueError(
            'Unable to model {} of the genome, consider reducing max ploidy '
            'or increasing max copy number'.format(1. - proportion_below_max_depth))

    init_params = []
    divergence_weight_params = [{'divergence_weight': w} for w in divergence_weights]
    for h_p, w_p in itertools.product(init_h_params, divergence_weight_params):
        params = h_p.copy()
        params.update(w_p)
        params['max_depth'] = max_depth
        init_params.append(params)

    with HDFStore(init_results_filename, 'w') as store:
        store['read_depth'] = read_depth
        store['minor_modes'] = pd.Series(minor_modes, index=range(len(minor_modes)))

    return dict(enumerate(init_params))


def fit_task(results_filename, experiment_filename, init_params, config):
    """Single-restart fit job (analysis/pipeline.py:112-124)."""
    with open(experiment_filename, 'rb') as f:
        experiment = pickle.load(f)

    fit_results = fit(experiment, init_params, config)

    with open(results_filename, 'wb') as f:
        pickle.dump(fit_results, f)


def fit(experiment, init_params, config):
    """Fit one restart (analysis/pipeline.py:127-228)."""
    model = build_model(experiment, init_params, config)
    return fit_with_model(model, experiment, init_params, config)


def fit_many(experiment, init_params_dict, config):
    """Fit every restart sharing one model (state space, compiled engine).

    The restart grid shares a common max_depth by construction
    (analysis/pipeline.py:85-88), so only the divergence weight and h
    initialization vary — both traced parameters. This replaces the
    reference's one-cluster-job-per-restart fan-out with a single process
    reusing compiled kernels across the grid.

    Returns {init_id: fit_results}.
    """
    results = {}
    model = None
    for init_id, init_params in init_params_dict.items():
        if model is None:
            model = build_model(experiment, init_params, config)
        else:
            model.reset_restart(
                max_depth=init_params['max_depth'],
                divergence_weight=init_params['divergence_weight'])
        results[init_id] = fit_with_model(model, experiment, init_params, config)
    return results


def build_model(experiment, init_params, config):
    """Construct the BreakpointModel for a restart's configuration."""
    divergence_weight = init_params['divergence_weight']
    max_depth = init_params['max_depth']

    import jax.numpy as jnp

    get = lambda name: remixt_tpu.config.get_param(config, name)
    dtype = {'float32': jnp.float32, 'float64': jnp.float64}[get('engine_dtype')]
    normal_contamination = get('normal_contamination')
    max_copy_number = get('max_copy_number')
    min_segment_length = get('likelihood_min_segment_length')
    min_proportion_genotyped = get('likelihood_min_proportion_genotyped')
    num_em_iter = get('num_em_iter')
    num_update_iter = get('num_update_iter')
    disable_breakpoints = get('disable_breakpoints')
    is_female = get('is_female')
    do_h_update = get('do_h_update')

    normal_copies = np.array([[1, 1]] * experiment.l.shape[0])
    if not is_female:
        normal_copies[experiment.segment_chromosome_id == 'X', :] = np.array([1, 0])
        if np.any(experiment.x[experiment.segment_chromosome_id == 'X', 0:2] > 0):
            raise Exception('inconsistent allele read counts for chromosome X')

    model = BreakpointModel(
        experiment.x,
        experiment.l,
        experiment.adjacencies,
        experiment.breakpoints,
        max_copy_number=max_copy_number,
        normal_contamination=normal_contamination,
        divergence_weight=divergence_weight,
        min_segment_length=min_segment_length,
        min_proportion_genotyped=min_proportion_genotyped,
        max_depth=max_depth,
        normal_copies=normal_copies,
        disable_breakpoints=disable_breakpoints,
        do_h_update=do_h_update,
        random_seed=config.get('random_seed', 1234),
        dtype=dtype,
    )

    model.num_em_iter = num_em_iter
    model.num_update_iter = num_update_iter

    return model


def fit_with_model(model, experiment, init_params, config):
    """Run one restart on a (possibly shared) model and extract results."""
    h_init = np.array([
        init_params['h_normal'],
        init_params['h_tumour'] * init_params['mix_frac'],
        init_params['h_tumour'] * (1. - init_params['mix_frac']),
    ])
    disable_breakpoints = remixt_tpu.config.get_param(config, 'disable_breakpoints')

    # convergence-testing hook: initialize breakpoints from simulated truth
    model.breakpoint_init = None
    if config.get('optimal_initialization', False):
        breakpoint_init = (
            experiment.genome_mixture.genome_collection.collapsed_breakpoint_copy_number())
        for bp in experiment.genome_mixture.detected_breakpoints.values():
            if bp not in breakpoint_init:
                breakpoint_init[bp] = np.zeros((experiment.genome_mixture.M,))
        swap = (experiment.h[1] < experiment.h[2]) != (h_init[1] < h_init[2])
        if swap:
            for bp, cn in breakpoint_init.items():
                cn = cn.copy()
                cn[1:] = cn[1:][::-1]
                breakpoint_init[bp] = cn
        model.breakpoint_init = breakpoint_init

    model.fit(h_init)

    fit_results = dict()

    cn, brk_cn = model.optimal_cn()

    if disable_breakpoints:
        brk_cn = decode_breakpoints_naive(
            cn, experiment.adjacencies, experiment.breakpoints)

    fit_results['h'] = model.h
    fit_results['cn'] = cn
    fit_results['brk_cn'] = brk_cn
    fit_results['p_outlier_total'] = model.p_outlier_total
    fit_results['p_outlier_allele'] = model.p_outlier_allele
    fit_results['total_likelihood_mask'] = model.total_likelihood_mask
    fit_results['allele_likelihood_mask'] = model.allele_likelihood_mask

    fit_results['stats'] = dict()
    fit_results['stats']['elbo'] = model.prev_elbo
    fit_results['stats']['elbo_diff'] = model.prev_elbo_diff
    fit_results['stats']['error_message'] = ''
    fit_results['stats'].update(model.get_likelihood_param_values())

    ploidy = (cn[:, 1:, :].mean(axis=1).T * experiment.l).sum() / experiment.l.sum()
    divergent = (cn[:, 1:, :].max(axis=1) != cn[:, 1:, :].min(axis=1)) * 1.
    proportion_divergent = (divergent.T * experiment.l).sum() / (2. * experiment.l.sum())

    fit_results['stats']['num_clones'] = len(model.h)
    fit_results['stats']['num_segments'] = len(experiment.x)
    fit_results['stats']['ploidy'] = ploidy
    fit_results['stats']['proportion_divergent'] = proportion_divergent
    fit_results['stats']['mode_idx'] = init_params['mode_idx']
    fit_results['stats']['divergence_weight'] = init_params['divergence_weight']

    return fit_results


def store_fit_results(store, experiment, fit_results, key_prefix):
    """Write one solution's tables (analysis/pipeline.py:231-250)."""
    h = fit_results['h']
    cn = fit_results['cn']
    brk_cn = fit_results['brk_cn']

    cn_table = remixt_tpu.analysis.experiment.create_cn_table(experiment, cn, h)

    cn_table['prob_is_outlier_total'] = fit_results['p_outlier_total'][:, 1]
    cn_table['prob_is_outlier_allele'] = fit_results['p_outlier_allele'][:, 1]
    cn_table['total_likelihood_mask'] = fit_results['total_likelihood_mask']
    cn_table['allele_likelihood_mask'] = fit_results['allele_likelihood_mask']

    brk_cn_table = remixt_tpu.analysis.experiment.create_brk_cn_table(
        brk_cn, experiment.breakpoint_segment_data)

    store[key_prefix + '/h'] = pd.Series(h, index=range(len(h)))
    store[key_prefix + '/cn'] = cn_table
    store[key_prefix + '/mix'] = pd.Series(h / h.sum(), index=range(len(h)))
    store[key_prefix + '/brk_cn'] = brk_cn_table


def store_optimal_solution(stats, store, config):
    """Select and alias the best solution by ELBO after the divergence filter
    (analysis/pipeline.py:253-264)."""
    max_prop_diverge = remixt_tpu.config.get_param(config, 'max_prop_diverge')

    if (stats['proportion_divergent'] < max_prop_diverge).any():
        stats = stats[stats['proportion_divergent'] < max_prop_diverge].copy()
    stats = stats.sort_values('elbo', ascending=False)
    solution_idx = stats.loc[stats.index[0], 'init_id']

    key_prefix = '/solutions/solution_{}'.format(solution_idx)
    store['/cn'] = store[key_prefix + '/cn']
    store['/mix'] = store[key_prefix + '/mix']
    store['/brk_cn'] = store[key_prefix + '/brk_cn']


def collate(collate_filename, experiment_filename, init_results_filename,
            fit_results_filenames, config):
    """Merge per-restart results into the final results store
    (analysis/pipeline.py:267-293)."""
    stats_table = []
    for init_id, results_filename in fit_results_filenames.items():
        with open(results_filename, 'rb') as f:
            results = pickle.load(f)
        stats = dict(results['stats'])
        stats['init_id'] = init_id
        stats_table.append(stats)
    stats_table = pd.DataFrame(stats_table)

    with HDFStore(collate_filename, 'w') as collated:
        collated['stats'] = stats_table

        with HDFStore(init_results_filename, 'r') as results:
            for key in results.keys():
                collated[key] = results[key]

        with open(experiment_filename, 'rb') as f:
            experiment = pickle.load(f)

        for init_id, results_filename in fit_results_filenames.items():
            with open(results_filename, 'rb') as f:
                results = pickle.load(f)
            store_fit_results(collated, experiment, results,
                              'solutions/solution_{0}'.format(init_id))

        store_optimal_solution(stats_table, collated, config)
