"""Simulation subsystem tests.

Patterns from the reference suite: seed-replay invariants
(test_remixt.py:388-434 test_recreate/test_rewind), sampler sanity, and the
evaluation metrics applied to a perfect prediction (must score 1.0).
"""

import numpy as np
import pandas as pd
import pytest

import remixt_tpu.simulations.genome as sim_genome
import remixt_tpu.simulations.pipeline as sim_pipeline


GENOME_PARAMS = dict(
    sim_genome.RearrangedGenome.default_params,
    genome_length=3e8, num_chromosomes=5, seg_length_min=10000,
)


def make_genome(N=100, num_events=10, seed=123):
    np.random.seed(seed)
    genome = sim_genome.RearrangedGenome(N)
    genome.create(dict(GENOME_PARAMS))
    for _ in range(num_events):
        genome.rearrange(dict(GENOME_PARAMS))
    return genome


def test_recreate():
    """Replaying stored seeds must reproduce the genome exactly."""
    genome = make_genome()
    chromosomes_before = list(genome.chromosomes)
    cn_before = genome.segment_copy_number.copy()

    genome.recreate()

    assert genome.chromosomes == chromosomes_before
    np.testing.assert_array_equal(genome.segment_copy_number, cn_before)


def test_rewind():
    """Rewinding to k events matches a genome built with only those events."""
    genome = make_genome(num_events=10)

    partial = genome.copy()
    partial.rewind(4)

    replay = sim_genome.RearrangedGenome(genome.N)
    replay.init_params = genome.init_params
    replay.init_seed = genome.init_seed
    replay.event_params = list(genome.event_params[:4])
    replay.event_seeds = list(genome.event_seeds[:4])
    replay.recreate()

    assert partial.chromosomes == replay.chromosomes


def test_copy_independence():
    genome = make_genome(num_events=2)
    clone = genome.copy()
    np.random.seed(99)
    clone.rearrange(dict(GENOME_PARAMS))
    # parent history unchanged
    assert len(genome.event_seeds) == 2
    assert len(clone.event_seeds) == 3


def test_segment_copy_number_wild_type():
    np.random.seed(5)
    genome = sim_genome.RearrangedGenome(50)
    genome.create(dict(GENOME_PARAMS))
    cn = genome.segment_copy_number
    np.testing.assert_array_equal(cn, np.ones((50, 2)))
    assert len(genome.breakpoints) == 0
    assert genome.ploidy() == pytest.approx(2.0)


def test_breakpoint_copy_number_consistency():
    """Every reported breakpoint has positive copies; wild-type adjacencies
    are never reported."""
    genome = make_genome(num_events=15, seed=7)
    brk_cn = genome.breakpoint_copy_number
    for bp, cn in brk_cn.items():
        assert cn > 0
        assert bp not in genome.wt_adj


@pytest.fixture(scope='module')
def sampled_experiment():
    np.random.seed(11)
    params = dict(
        GENOME_PARAMS,
        N=100, M=3,
        num_ancestral_events=10, num_descendent_events=4,
        ploidy=2.0, ploidy_max_error=0.7,
        proportion_loh=0.1, proportion_loh_max_error=0.3,
        proportion_subclonal=0.1, proportion_subclonal_max_error=0.3,
        proportion_subclonal_stddev=0.1,
        ploidy_stddev=0.3, proportion_loh_stddev=0.1,
        num_swarm=20,
        frac_normal=0.4, num_false_breakpoints=5,
        h_total=0.08,
        random_seed=11,
    )
    history_sampler = sim_genome.RearrangementHistorySampler(params)
    collection_sampler = sim_genome.GenomeCollectionSampler(history_sampler, params)
    mixture_sampler = sim_genome.GenomeMixtureSampler(params)
    experiment_sampler = sim_genome.ExperimentSampler(params)

    collection = collection_sampler.sample_genome_collection()
    mixture = mixture_sampler.sample_genome_mixture(collection)
    experiment = experiment_sampler.sample_experiment(mixture)
    return experiment


def test_genome_collection(sampled_experiment):
    gc = sampled_experiment.genome_mixture.genome_collection
    assert gc.M == 3
    assert gc.cn.shape == (gc.N, 3, 2)
    # normal clone is diploid
    np.testing.assert_array_equal(gc.cn[:, 0, :], np.ones((gc.N, 2)))


def test_experiment_counts(sampled_experiment):
    exp = sampled_experiment
    assert exp.x.shape == (exp.N, 3)
    assert np.all(exp.x[:, 1] <= exp.x[:, 0])
    assert np.all(exp.x >= 0)
    # read counts roughly consistent with depth
    expected = (exp.l * (exp.cn.sum(axis=2) * exp.h).sum(axis=1))
    observed = exp.x[:, 2]
    ratio = observed.sum() / expected.sum()
    assert 0.8 < ratio < 1.2


def test_evaluate_perfect_prediction(sampled_experiment):
    """The evaluation metrics must give a perfect score to the truth."""
    exp = sampled_experiment
    mixture = exp.genome_mixture

    cn_table = pd.DataFrame({
        'chromosome': mixture.segment_chromosome_id,
        'start': mixture.segment_start,
        'end': mixture.segment_end,
        'major_1': mixture.cn[:, 1, :].max(axis=1),
        'minor_1': mixture.cn[:, 1, :].min(axis=1),
        'major_2': mixture.cn[:, 2, :].max(axis=1),
        'minor_2': mixture.cn[:, 2, :].min(axis=1),
    })

    # perfect breakpoint prediction from minimized truth
    min_true = mixture.genome_collection.collapsed_minimal_breakpoint_copy_number()
    rows = []
    for prediction_id, bp in mixture.detected_breakpoints.items():
        cn = min_true.get(bp, np.zeros(3))
        rows.append({'prediction_id': prediction_id,
                     'cn_1': cn[1], 'cn_2': cn[2]})
    brk_cn_table = pd.DataFrame(rows)

    results = sim_pipeline.evaluate_results(
        mixture, cn_table, brk_cn_table, mixture.frac.copy())

    cn_eval = results['cn_evaluation']
    assert cn_eval['proportion_cn_correct'] == pytest.approx(1.0)
    assert cn_eval['proportion_dom_cn_correct'] == pytest.approx(1.0)
    assert cn_eval['true_ploidy'] == pytest.approx(cn_eval['pred_ploidy'])

    brk_eval = results['brk_cn_evaluation']
    assert brk_eval['brk_cn_correct_proportion'] == pytest.approx(1.0)

    mix_results = results['mix_results']
    for idx in range(3):
        assert mix_results['mix_true_%d' % idx] == pytest.approx(
            mix_results['mix_pred_%d' % idx])


def test_minimize_breakpoint_copies(sampled_experiment):
    gc = sampled_experiment.genome_mixture.genome_collection
    full = gc.collapsed_breakpoint_copy_number()
    minimal = gc.collapsed_minimal_breakpoint_copy_number()
    assert set(minimal.keys()) == set(full.keys())
    for bp in full:
        assert np.all(minimal[bp] <= full[bp])
