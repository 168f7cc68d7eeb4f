"""Simulation pipeline tasks and evaluation metrics.

Mirrors /root/reference/remixt/simulations/pipeline.py:16-840 — simulation
definition parsing, genome-mixture/experiment/read simulation tasks, the
accuracy evaluation suite (proportion_cn_correct and friends, breakpoint
copy-number precision/recall, mixture-fraction recovery, outlier-call
accuracy) and evaluation merging. These metrics are the reference's
benchmark yardstick (BASELINE.md).
"""

import collections
import itertools
import pickle

import numpy as np
import pandas as pd
import yaml

import remixt_tpu.config
import remixt_tpu.segalg
import remixt_tpu.cn_plot
from remixt_tpu.io.hdf5 import HDFStore
import remixt_tpu.simulations.genome as sim_genome
import remixt_tpu.simulations.haplotype
import remixt_tpu.simulations.seqread


def read_sim_defs(sim_defs_filename):
    """Parse a python-syntax simulation definition file into per-simulation
    settings dicts (pipeline.py:16-71)."""
    sim_defs = dict()
    with open(sim_defs_filename) as f:
        exec(f.read(), {}, sim_defs)

    default_settings = sim_defs['defaults']

    settings_dicts = dict()

    for name, settings in sim_defs.items():
        if not name.endswith('_settings'):
            continue
        name = name[:-len('_settings')]

        permute = [list(zip(itertools.repeat(key), values))
                   for key, values in settings.items()]
        product = itertools.product(*permute)

        def unzip_tied_setting(key, value):
            if isinstance(key, tuple):
                if len(key) != len(value):
                    raise ValueError('incompatible key/value lengths for tied values')
                for k, v in zip(key, value):
                    yield k, v
            else:
                yield key, value

        def unzip_sim(sim):
            return itertools.chain(
                *[unzip_tied_setting(key, value) for key, value in sim])

        unzipped = list([dict(unzip_sim(a)) for a in product])

        settings_df = pd.DataFrame(unzipped)
        assert not settings_df.isnull().any().any()
        settings_df['name'] = name

        for key, value in default_settings.items():
            if key not in settings_df:
                settings_df[key] = [value] * len(settings_df.index)

        settings_df['sim_hash'] = settings_df.apply(
            lambda row: abs(hash(frozenset(
                (k, str(v)) for k, v in row.to_dict().items()))), axis=1).astype(str)
        assert not settings_df['sim_hash'].duplicated().any()
        settings_df['sim_id'] = settings_df['name'] + '_' + settings_df['sim_hash']

        for _, row in settings_df.iterrows():
            settings_dicts[row['sim_id']] = row.to_dict()

    return settings_dicts


def create_simulations(sim_defs_filename, config, ref_data_dir):
    """Expand a YAML simulation definition into per-instance parameter dicts
    (pipeline.py:74-124)."""
    sim_defs = yaml.safe_load(open(sim_defs_filename))

    # reference chromosome lengths only needed when a simulation doesn't
    # specify its own
    chromosome_lengths = None
    if ref_data_dir is not None:
        chromosome_lengths = remixt_tpu.config.get_chromosome_lengths(
            config, ref_data_dir)

    def instance_name(sim_name, sim_idx, rep_idx):
        return '{}_{}_{}'.format(sim_name, sim_idx, rep_idx)

    simulations = dict()
    for sim_name, sim_params in sim_defs['simulations'].items():
        num_simulations = sim_params['num_simulations']
        num_replicates = sim_params['num_replicates']
        random_seed = sim_params['random_seed_start']

        for sim_idx in range(num_simulations):
            for rep_idx in range(num_replicates):
                simulations[instance_name(sim_name, sim_idx, rep_idx)] = (
                    sim_defs['defaults'].copy())
                simulations[instance_name(sim_name, sim_idx, rep_idx)]['random_seed'] = random_seed
                random_seed += 1

        for sim_config_name, sim_config_value in sim_params.items():
            if sim_config_name == 'num_simulations':
                continue
            try:
                len(sim_config_value)
            except TypeError:
                sim_config_value = [sim_config_value]
            if len(sim_config_value) == 1:
                sim_config_value = [sim_config_value[0]] * num_simulations
            if len(sim_config_value) != num_simulations:
                raise TypeError('sim config length mismatch for {}, {}'.format(
                    sim_name, sim_config_name))
            for sim_idx, value in enumerate(sim_config_value):
                for rep_idx in range(num_replicates):
                    simulations[instance_name(sim_name, sim_idx, rep_idx)][sim_config_name] = value

    for sim_params in simulations.values():
        if 'chromosome_lengths' not in sim_params:
            if chromosome_lengths is None:
                raise ValueError(
                    'chromosome_lengths required in sim defs when no '
                    'ref_data_dir is provided')
            chromosomes = sim_params.get(
                'chromosomes', [str(a) for a in range(1, 23)])
            sim_params['chromosome_lengths'] = {
                chrom: chromosome_lengths[chrom] for chrom in chromosomes}
        if 'chromosomes' not in sim_params:
            sim_params['chromosomes'] = list(sim_params['chromosome_lengths'].keys())

    return simulations


# ---------------------------------------------------------------------------
# simulation tasks
# ---------------------------------------------------------------------------

def simulate_genome_mixture(mixture_filename, mixture_plot_filename, params):
    """(pipeline.py:127-141)"""
    history_sampler = sim_genome.RearrangementHistorySampler(params)
    genomes_sampler = sim_genome.GenomeCollectionSampler(history_sampler, params)
    mixture_sampler = sim_genome.GenomeMixtureSampler(params)

    np.random.seed(params['random_seed'])

    genomes = genomes_sampler.sample_genome_collection()
    genome_mixture = mixture_sampler.sample_genome_mixture(genomes)

    with open(mixture_filename, 'wb') as mixture_file:
        pickle.dump(genome_mixture, mixture_file)

    if mixture_plot_filename is not None:
        remixt_tpu.cn_plot.plot_mixture(mixture_plot_filename, mixture_filename)


def simulate_experiment(experiment_filename, experiment_plot_filename, params):
    """(pipeline.py:144-160)"""
    history_sampler = sim_genome.RearrangementHistorySampler(params)
    genomes_sampler = sim_genome.GenomeCollectionSampler(history_sampler, params)
    mixture_sampler = sim_genome.GenomeMixtureSampler(params)
    experiment_sampler = sim_genome.ExperimentSampler(params)

    np.random.seed(params['random_seed'])

    genomes = genomes_sampler.sample_genome_collection()
    genome_mixture = mixture_sampler.sample_genome_mixture(genomes)
    experiment = experiment_sampler.sample_experiment(genome_mixture)

    with open(experiment_filename, 'wb') as experiment_file:
        pickle.dump(experiment, experiment_file)

    if experiment_plot_filename is not None:
        remixt_tpu.cn_plot.plot_experiment(experiment_plot_filename, experiment_filename)


def simulate_germline_alleles(germline_alleles_filename, params, config, ref_data_dir):
    """(pipeline.py:163-170)"""
    np.random.seed(params['random_seed'])

    import h5py
    with h5py.File(germline_alleles_filename, 'w') as store:
        for chromosome in params['chromosomes']:
            alleles_table = remixt_tpu.simulations.haplotype.create_sim_alleles(
                chromosome, config, ref_data_dir)
            group = store.create_group('chromosome_{}'.format(chromosome))
            for col in alleles_table.columns:
                group.create_dataset(col, data=alleles_table[col].values,
                                     compression='gzip', compression_opts=4)


def load_germline_alleles(germline_alleles_filename, chromosome):
    """Read one chromosome's germline allele table."""
    import h5py
    with h5py.File(germline_alleles_filename, 'r') as store:
        group = store['chromosome_{}'.format(chromosome)]
        return pd.DataFrame({col: group[col][()] for col in group})


class _GermlineAllelesAccessor(object):
    """Mapping-style access ('/chromosome_X') over the germline alleles h5."""

    def __init__(self, filename):
        self.filename = filename

    def __getitem__(self, key):
        chromosome = key.split('chromosome_')[-1]
        return load_germline_alleles(self.filename, chromosome)


def simulate_normal_data(read_data_filename, mixture_filename,
                         germline_alleles_filename, params):
    """(pipeline.py:173-187)"""
    with open(mixture_filename, 'rb') as mixture_file:
        genome_mixture = pickle.load(mixture_file)

    germline_genome = genome_mixture.genome_collection.genomes[0]
    germline_alleles = _GermlineAllelesAccessor(germline_alleles_filename)

    np.random.seed(params['random_seed'])

    remixt_tpu.simulations.seqread.simulate_mixture_read_data(
        read_data_filename, [germline_genome], [params['h_total']],
        germline_alleles, params)


def resample_normal_data(read_data_filename, source_filename, mixture_filename,
                         germline_alleles_filename, params):
    """(pipeline.py:190-206)"""
    with open(mixture_filename, 'rb') as mixture_file:
        genome_mixture = pickle.load(mixture_file)

    germline_genome = genome_mixture.genome_collection.genomes[0]
    germline_alleles = _GermlineAllelesAccessor(germline_alleles_filename)

    np.random.seed(params['random_seed'])

    remixt_tpu.simulations.seqread.resample_mixture_read_data(
        read_data_filename, source_filename, [germline_genome],
        [params['h_total']], germline_alleles, params)


def simulate_tumour_data(read_data_filename, mixture_filename,
                         germline_alleles_filename, params):
    """(pipeline.py:209-224)"""
    with open(mixture_filename, 'rb') as mixture_file:
        gm = pickle.load(mixture_file)

    germline_alleles = _GermlineAllelesAccessor(germline_alleles_filename)

    np.random.seed(params['random_seed'])

    remixt_tpu.simulations.seqread.simulate_mixture_read_data(
        read_data_filename, gm.genome_collection.genomes,
        gm.frac * params['h_total'], germline_alleles, params)


def resample_tumour_data(read_data_filename, source_filename, mixture_filename,
                         germline_alleles_filename, params):
    """(pipeline.py:227-242)"""
    with open(mixture_filename, 'rb') as mixture_file:
        gm = pickle.load(mixture_file)

    germline_alleles = _GermlineAllelesAccessor(germline_alleles_filename)

    np.random.seed(params['random_seed'])

    remixt_tpu.simulations.seqread.resample_mixture_read_data(
        read_data_filename, source_filename, gm.genome_collection.genomes,
        gm.frac * params['h_total'], germline_alleles, params)


def tabulate_experiment(exp_table_filename, sim_id, experiment_filename):
    """(pipeline.py:246-270)"""
    with open(experiment_filename, 'rb') as experiment_file:
        exp = pickle.load(experiment_file)

    exp_data = dict()
    exp_data['sim_id'] = sim_id
    exp_data['proportion_divergent'] = (
        exp.genome_mixture.genome_collection.length_divergent()
        / float(np.sum(exp.genome_mixture.l)))

    gc = exp.genome_mixture.genome_collection
    for idx, genome in enumerate(gc.genomes):
        exp_data['proportion_loh_{0}'.format(idx)] = genome.proportion_loh()
        exp_data['proportion_hdel_{0}'.format(idx)] = genome.proportion_hdel()
        exp_data['proportion_hlamp_{0}'.format(idx)] = genome.proportion_hlamp()

    pd.DataFrame([exp_data]).to_csv(exp_table_filename, sep='\t', index=False)


def merge_tables(output_filename, input_filenames):
    """(pipeline.py:273-283)"""
    output_table = [pd.read_csv(f, sep='\t', dtype=str)
                    for f in input_filenames.values()]
    pd.concat(output_table, ignore_index=True).to_csv(
        output_filename, sep='\t', index=False)


def write_segments(segment_filename, genomes_filename):
    """(pipeline.py:299-311)"""
    with open(genomes_filename, 'rb') as genomes_file:
        gc = pickle.load(genomes_file)

    pd.DataFrame({
        'chromosome': gc.segment_chromosome_id,
        'start': gc.segment_start,
        'end': gc.segment_end,
    }).to_csv(segment_filename, sep='\t', index=False, header=True)


def write_perfect_segments(segment_filename, genomes_filename):
    """Segments merged at true copy-number changepoints (pipeline.py:314-337)."""
    with open(genomes_filename, 'rb') as genomes_file:
        gc = pickle.load(genomes_file)

    is_diff_next = (np.abs(np.diff(gc.cn, axis=0)).sum(axis=(1, 2)) > 0) * 1
    is_new_seg = np.concatenate(([1], is_diff_next))
    seg_id = is_new_seg.cumsum() - 1

    segment_data = pd.DataFrame({
        'chromosome': gc.segment_chromosome_id,
        'start': gc.segment_start,
        'end': gc.segment_end,
        'seg_id': seg_id,
    })

    segment_data = (
        segment_data
        .groupby(['chromosome', 'seg_id'])
        .agg({'start': 'min', 'end': 'max'})
        .reset_index()
        .drop('seg_id', axis=1)
    )

    segment_data.to_csv(segment_filename, sep='\t', index=False, header=True)


def write_breakpoints(breakpoint_filename, mixture_filename):
    """(pipeline.py:340-345)"""
    with open(mixture_filename, 'rb') as mixture_file:
        mixture = pickle.load(mixture_file)

    mixture.breakpoint_segment_data.to_csv(
        breakpoint_filename, sep='\t', header=True, index=False)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------

def evaluate_cn_results(genome_mixture, cn_data_table, order_true, order_pred,
                        allow_swap):
    """Segment copy-number accuracy metrics (pipeline.py:343-463)."""
    sim_segments = pd.DataFrame({
        'chromosome': genome_mixture.segment_chromosome_id,
        'start': genome_mixture.segment_start,
        'end': genome_mixture.segment_end,
    })

    if 'major_1' in cn_data_table:
        cn_true = genome_mixture.cn[:, 1:, :]
        cn_pred = np.array(
            [
                [cn_data_table['major_1'], cn_data_table['minor_1']],
                [cn_data_table['major_2'], cn_data_table['minor_2']],
            ]
        ).swapaxes(0, 2).swapaxes(1, 2)
    else:
        cn_true = np.zeros((genome_mixture.cn.shape[0],
                            genome_mixture.cn.shape[1] - 1, 1))
        cn_true[:, :, 0] = genome_mixture.cn[:, 1:, :].sum(axis=2)
        cn_pred = np.array(
            [
                [cn_data_table['total_1']],
                [cn_data_table['total_2']],
            ]
        ).swapaxes(0, 2).swapaxes(1, 2)

    cn_true = cn_true[:, order_true, :]
    cn_pred = cn_pred[:, order_pred, :]

    # consistent major/minor ordering
    cn_true = np.sort(cn_true, axis=2)
    cn_pred = np.sort(cn_pred, axis=2)

    cn_data_index = remixt_tpu.segalg.reindex_segments(sim_segments, cn_data_table)

    cn_true = cn_true[cn_data_index['idx_1'].values, :, :]
    cn_pred = cn_pred[cn_data_index['idx_2'].values, :, :]
    segment_lengths = (cn_data_index['end'] - cn_data_index['start']).values

    if cn_true.shape[1] != cn_pred.shape[1]:
        proportion_cn_correct = -1.
    else:
        if allow_swap:
            cn_correct = ((cn_true == cn_pred).all(axis=(1, 2))
                          | (cn_true == cn_pred[:, ::-1, :]).all(axis=(1, 2)))
        else:
            cn_correct = (cn_true == cn_pred).all(axis=(1, 2))
        proportion_cn_correct = (
            float((cn_correct * segment_lengths).sum()) / float(segment_lengths.sum()))

    is_dom_cn_correct = np.all(cn_true[:, 0, :] == cn_pred[:, 0, :], axis=1)
    proportion_dom_cn_correct = (
        float((is_dom_cn_correct * segment_lengths).sum()) / float(segment_lengths.sum()))

    is_clonal_true = np.all(
        cn_true[:, 0:1, :].swapaxes(1, 2) == cn_true[:, :, :].swapaxes(1, 2), axis=(1, 2))
    is_clonal_pred = np.all(
        cn_pred[:, 0:1, :].swapaxes(1, 2) == cn_pred[:, :, :].swapaxes(1, 2), axis=(1, 2))
    is_clonal_correct = is_clonal_true == is_clonal_pred
    is_subclonal_correct = ~is_clonal_true == ~is_clonal_pred

    proportion_clonal_correct = (
        float((is_clonal_correct * segment_lengths).sum()) / float(segment_lengths.sum()))
    proportion_subclonal_correct = (
        float((is_subclonal_correct * segment_lengths).sum()) / float(segment_lengths.sum()))

    evaluation = dict()
    evaluation['proportion_cn_correct'] = proportion_cn_correct
    evaluation['proportion_dom_cn_correct'] = proportion_dom_cn_correct
    evaluation['proportion_clonal_correct'] = proportion_clonal_correct
    evaluation['proportion_subclonal_correct'] = proportion_subclonal_correct
    evaluation['pred_ploidy'] = (
        (cn_pred.mean(axis=1) * segment_lengths[:, np.newaxis]).sum()
        / float(segment_lengths.sum()))
    evaluation['true_ploidy'] = (
        (cn_true.mean(axis=1) * segment_lengths[:, np.newaxis]).sum()
        / float(segment_lengths.sum()))
    evaluation['pred_ploidy_1'] = (
        (cn_pred[:, 0, :] * segment_lengths[:, np.newaxis]).sum()
        / float(segment_lengths.sum()))
    evaluation['true_ploidy_1'] = (
        (cn_true[:, 0, :] * segment_lengths[:, np.newaxis]).sum()
        / float(segment_lengths.sum()))
    evaluation['pred_ploidy_2'] = (
        (cn_pred[:, 1, :] * segment_lengths[:, np.newaxis]).sum()
        / float(segment_lengths.sum()))
    evaluation['true_ploidy_2'] = (
        (cn_true[:, 1, :] * segment_lengths[:, np.newaxis]).sum()
        / float(segment_lengths.sum()))

    pred_divergent = (cn_pred.max(axis=1) != cn_pred.min(axis=1)) * 1.
    true_divergent = (cn_true.max(axis=1) != cn_true.min(axis=1)) * 1.
    evaluation['pred_proportion_divergent'] = (
        (pred_divergent * segment_lengths[:, np.newaxis]).sum()
        / (2. * segment_lengths.sum()))
    evaluation['true_proportion_divergent'] = (
        (true_divergent * segment_lengths[:, np.newaxis]).sum()
        / (2. * segment_lengths.sum()))

    return {'cn_evaluation': pd.Series(evaluation)}


def evaluate_brk_cn_results(genome_mixture, brk_cn_table, order_true,
                            order_pred, allow_swap):
    """Breakpoint copy-number accuracy metrics (pipeline.py:466-572)."""
    true_cols = ['true_cn_{}'.format(m) for m in range(1, genome_mixture.M)]
    min_true_cols = ['min_true_cn_{}'.format(m) for m in range(1, genome_mixture.M)]

    pred_cols = []
    for m in itertools.count(1):
        if 'cn_{}'.format(m) not in brk_cn_table:
            break
        pred_cols.append('cn_{}'.format(m))

    data = genome_mixture.breakpoint_segment_data.set_index('prediction_id')

    for col in itertools.chain(true_cols, min_true_cols):
        data[col] = 0
    data['is_balanced'] = False

    true_brk_cn = genome_mixture.genome_collection.collapsed_breakpoint_copy_number()
    min_true_brk_cn = genome_mixture.genome_collection.collapsed_minimal_breakpoint_copy_number()
    true_balanced_breakpoints = genome_mixture.genome_collection.collapsed_balanced_breakpoints()

    for prediction_id, breakpoint in genome_mixture.detected_breakpoints.items():
        if breakpoint not in true_brk_cn:
            continue
        data.loc[prediction_id, true_cols] = true_brk_cn[breakpoint][1:]
        data.loc[prediction_id, min_true_cols] = min_true_brk_cn[breakpoint][1:]
        if breakpoint in true_balanced_breakpoints:
            data.loc[prediction_id, 'is_balanced'] = True

    data.reset_index(inplace=True)

    data = data.merge(brk_cn_table[['prediction_id'] + pred_cols],
                      on='prediction_id', how='left').fillna(0.0)

    data = data[~data['is_balanced']]

    cn_true = data[min_true_cols].values[:, order_true]
    cn_pred = data[pred_cols].values[:, order_pred]

    if cn_true.shape[1] != cn_pred.shape[1]:
        cn_correct = -1.
    else:
        if allow_swap:
            cn_correct = ((cn_true == cn_pred).all(axis=(1,))
                          | (cn_true == cn_pred[:, ::-1]).all(axis=(1,)))
        else:
            cn_correct = (cn_true == cn_pred).all(axis=(1,))

    data['cn_correct'] = cn_correct
    data['true_present'] = (data[min_true_cols] > 0).any(axis=1)
    data['pred_present'] = (data[pred_cols] > 0).any(axis=1)
    data['true_subclonal'] = (data[min_true_cols] == 0).any(axis=1) & data['true_present']
    data['pred_subclonal'] = (data[pred_cols] == 0).any(axis=1) & data['pred_present']

    evaluation = dict()
    evaluation['brk_cn_correct_proportion'] = (
        float(data['cn_correct'].sum()) / float(len(data.index)))
    evaluation['brk_cn_present_num_true'] = float(data['true_present'].sum())
    evaluation['brk_cn_present_num_pos'] = float(data['pred_present'].sum())
    evaluation['brk_cn_present_num_true_pos'] = (
        float((data['pred_present'] & data['true_present']).sum()))
    evaluation['brk_cn_subclonal_num_true'] = float(data['true_subclonal'].sum())
    evaluation['brk_cn_subclonal_num_pos'] = float(data['pred_subclonal'].sum())
    evaluation['brk_cn_subclonal_num_true_pos'] = (
        float((data['pred_subclonal'] & data['true_subclonal']).sum()))

    return {
        'brk_cn_table': data,
        'brk_cn_evaluation': pd.Series(evaluation),
    }


def evaluate_results(genome_mixture, cn_table, brk_cn_table, mix_pred):
    """Full evaluation with clone ordering and swap tolerance
    (pipeline.py:575-647)."""
    if len(cn_table.index) == 0 or mix_pred.shape[0] == 0:
        return {
            'brk_cn_evaluation': pd.Series(dtype=float),
            'brk_cn_table': pd.DataFrame(),
            'cn_evaluation': pd.Series(dtype=float),
            'mix_results': pd.Series(dtype=float)}

    cn_table = cn_table.copy()
    brk_cn_table = brk_cn_table.copy()
    mix_true = genome_mixture.frac.copy()

    # evaluation code assumes 2 tumour clones
    if 'major_1' in cn_table and 'major_2' not in cn_table:
        cn_table['major_2'] = cn_table['major_1']
        cn_table['minor_2'] = cn_table['minor_1']
    if 'total_1' in cn_table and 'total_2' not in cn_table:
        cn_table['total_2'] = cn_table['total_1']
    if 'cn_2' not in brk_cn_table:
        brk_cn_table['cn_2'] = brk_cn_table['cn_1']
    if len(mix_pred) == 2:
        mix_pred = np.concatenate([mix_pred, [0.]])

    mix_pred = np.asarray(mix_pred, dtype=float)
    mix_true = np.asarray(mix_true, dtype=float)

    order_true = np.argsort(mix_true[1:])[::-1]
    mix_true[1:] = mix_true[1:][order_true]

    order_pred = np.argsort(mix_pred[1:])[::-1]
    mix_pred[1:] = mix_pred[1:][order_pred]

    allow_swap = mix_true[1:].min() / mix_true[1:].max() > 0.75

    results = evaluate_cn_results(
        genome_mixture, cn_table, order_true, order_pred, allow_swap)
    results.update(evaluate_brk_cn_results(
        genome_mixture, brk_cn_table, order_true, order_pred, allow_swap))

    mix_results = {}
    for idx, f in enumerate(mix_true):
        mix_results['mix_true_' + str(idx)] = f
    for idx, f in enumerate(mix_pred):
        mix_results['mix_pred_' + str(idx)] = f
    results['mix_results'] = pd.Series(mix_results)

    return results


def evaluate_likelihood_results(experiment, cn_data_table):
    """Outlier-call accuracy against simulated outliers (pipeline.py:650-693)."""
    sim_segments = pd.DataFrame({
        'chromosome': experiment.genome_mixture.segment_chromosome_id,
        'start': experiment.genome_mixture.segment_start,
        'end': experiment.genome_mixture.segment_end,
    })

    cn_data_index = remixt_tpu.segalg.reindex_segments(sim_segments, cn_data_table)

    is_outlier_total_pred = (cn_data_table['prob_is_outlier_total'] > 0.5).values
    is_outlier_allele_pred = (cn_data_table['prob_is_outlier_allele'] > 0.5).values

    is_outlier_total_true = experiment.is_outlier_total[cn_data_index['idx_1'].values]
    is_outlier_allele_true = experiment.is_outlier_allele[cn_data_index['idx_1'].values]

    is_outlier_total_pred = is_outlier_total_pred[cn_data_index['idx_2'].values]
    is_outlier_allele_pred = is_outlier_allele_pred[cn_data_index['idx_2'].values]

    is_outlier_total_correct = is_outlier_total_true == is_outlier_total_pred
    is_outlier_allele_correct = is_outlier_allele_true == is_outlier_allele_pred

    segment_lengths = (cn_data_index['end'] - cn_data_index['start']).values

    evaluation = {}
    evaluation['correct_outlier_total_proportion'] = (
        (is_outlier_total_correct * segment_lengths).sum() / float(segment_lengths.sum()))
    evaluation['correct_outlier_allele_proportion'] = (
        (is_outlier_allele_correct * segment_lengths).sum() / float(segment_lengths.sum()))

    return {'outlier_evaluation': pd.Series(evaluation)}


def evaluate_results_task(evaluation_filename, results_filename,
                          mixture_filename=None, experiment_filename=None,
                          key_prefix=''):
    """Evaluate one results store against simulation truth
    (pipeline.py:694-737)."""
    with HDFStore(results_filename, 'r') as store:
        cn_table = store[key_prefix + '/cn']
        brk_cn_table = pd.DataFrame(columns=['prediction_id', 'cn_1', 'cn_2'])
        if (key_prefix + '/brk_cn') in store.keys():
            brk_cn_table = store[key_prefix + '/brk_cn']
        mix_pred = store[key_prefix + '/mix'].values

    experiment = None
    if mixture_filename is not None:
        with open(mixture_filename, 'rb') as mixture_file:
            mixture = pickle.load(mixture_file)
    elif experiment_filename is not None:
        with open(experiment_filename, 'rb') as experiment_file:
            experiment = pickle.load(experiment_file)
        mixture = experiment.genome_mixture
    else:
        raise ValueError('either mixture_filename or experiment_filename must be set')

    evaluation = evaluate_results(mixture, cn_table, brk_cn_table, mix_pred)

    if experiment is not None and hasattr(experiment, 'is_outlier_total'):
        evaluation.update(evaluate_likelihood_results(experiment, cn_table))

    with HDFStore(evaluation_filename, 'w') as store:
        for key, data in evaluation.items():
            store['/' + key] = data


def merge_evaluations(merged_filename, sim_defs, evaluation_filenames, key_names):
    """Merge per-simulation/tool evaluations into one store
    (pipeline.py:740-777)."""
    with HDFStore(merged_filename, 'w') as merged_store:
        sim_defs_table = pd.DataFrame(
            list(sim_defs.values()),
            index=pd.Index(list(sim_defs.keys()), name='sim_id'),
        ).reset_index()
        merged_store['/simulations'] = sim_defs_table.astype(str)

        tables = collections.defaultdict(list)
        for key, evaluation_filename in evaluation_filenames.items():
            with HDFStore(evaluation_filename, 'r') as store:
                if not isinstance(key, tuple):
                    key = (key,)

                for table_name in ('/cn_evaluation', '/brk_cn_evaluation',
                                   '/mix_results', '/outlier_evaluation'):
                    if table_name not in store.keys():
                        continue
                    table = store[table_name]
                    for value, name in zip(key, key_names):
                        table[name] = value
                    tables[table_name].append(table)

                if '/brk_cn_table' in store.keys():
                    merged_store['/brk_cn_table/' + '/'.join(str(k) for k in key)] = (
                        store['/brk_cn_table'])

        for table_name, table_list in tables.items():
            merged_store[table_name] = pd.DataFrame(table_list)
