"""Experiment assembly: count table + breakpoint table → model inputs.

Mirrors /root/reference/remixt/analysis/experiment.py:8-422 — mapping
breakpoints to segment extremities (within max_brk_dist), wild-type
adjacencies (max 3 Mb gap), the Experiment container exposing x/l/
adjacencies/breakpoints, and the output cn/brk_cn table builders.
"""

import itertools
import pickle

import numpy as np
import pandas as pd


def find_closest(a, v):
    """Index into sorted `a` of the element closest to each value in `v`,
    plus the distance (experiment.py:8-35)."""
    right_idx = np.minimum(np.searchsorted(a, v), len(a) - 1)
    left_idx = np.maximum(right_idx - 1, 0)

    left_dist = v - a[left_idx]
    right_dist = a[right_idx] - v

    least_dist_idx = np.where(left_dist < right_dist, left_idx, right_idx)
    least_dist = np.minimum(left_dist, right_dist)

    return least_dist_idx, least_dist


def find_closest_segment_end(segment_data, breakpoint_data):
    """Map each breakend to the closest segment extremity of matching
    chromosome/strand (experiment.py:38-121).

    Returns columns: prediction_id, prediction_side, segment_idx,
    segment_side, dist.
    """
    break_ends = segment_data_breakends(breakpoint_data)

    segment_end = segment_data[['start', 'end']].rename(
        columns={'start': 0, 'end': 1}).stack()
    segment_end.name = 'position'
    segment_end.index.names = ('segment_idx', 'segment_side')
    segment_end = segment_end.reset_index()
    segment_end = segment_end.merge(
        segment_data[['chromosome']], left_on='segment_idx', right_index=True)
    segment_end['strand'] = np.where(segment_end['segment_side'] == 0, '-', '+')

    chromosomes = list(segment_end['chromosome'].unique())
    strands = ('+', '-')

    tables = []
    for chromosome, strand in itertools.product(chromosomes, strands):
        chrom_break_end = break_ends.loc[
            (break_ends['chromosome'] == chromosome) &
            (break_ends['strand'] == strand),
            ['prediction_id', 'prediction_side', 'position'],
        ].copy()

        chrom_segment_end = segment_end.loc[
            (segment_end['chromosome'] == chromosome) &
            (segment_end['strand'] == strand),
            ['segment_idx', 'segment_side', 'position'],
        ].copy()

        if len(chrom_segment_end.index) == 0 or len(chrom_break_end.index) == 0:
            continue

        chrom_segment_end = chrom_segment_end.sort_values('position').reset_index()

        idx, dist = find_closest(
            chrom_segment_end['position'].values, chrom_break_end['position'].values)

        chrom_break_end['idx'] = idx
        chrom_break_end['dist'] = dist

        chrom_break_end = chrom_break_end.merge(
            chrom_segment_end[['segment_idx', 'segment_side']],
            left_on='idx', right_index=True)
        chrom_break_end.drop(['idx', 'position'], axis=1, inplace=True)

        tables.append(chrom_break_end)

    if not tables:
        return pd.DataFrame(columns=[
            'prediction_id', 'prediction_side', 'dist',
            'segment_idx', 'segment_side'])
    return pd.concat(tables, ignore_index=True)


def segment_data_breakends(breakpoint_data):
    """Long-format breakend table from a breakpoint prediction table."""
    break_ends = breakpoint_data[[
        'prediction_id',
        'chromosome_1', 'strand_1', 'position_1',
        'chromosome_2', 'strand_2', 'position_2',
    ]].copy()
    break_ends.set_index('prediction_id', inplace=True)
    break_ends.columns = pd.MultiIndex.from_tuples(
        [tuple(c.split('_')) for c in break_ends.columns])
    break_ends = break_ends.stack(future_stack=True)
    break_ends.index.names = ('prediction_id', 'prediction_side')
    break_ends = break_ends.reset_index()
    break_ends['prediction_side'] = np.where(
        break_ends['prediction_side'] == '1', 0, 1)
    return break_ends


def get_wild_type_adjacencies(segment_data, max_seg_gap):
    """Pairs of same-chromosome adjacent segment indices with gap at most
    max_seg_gap (experiment.py:124-143)."""
    chrom = segment_data['chromosome'].values
    start = segment_data['start'].values
    end = segment_data['end'].values

    adjacencies = set()
    for idx in range(len(segment_data.index) - 1):
        same_chrom = chrom[idx] == chrom[idx + 1]
        gap_length = start[idx + 1] - end[idx]
        if same_chrom and gap_length <= max_seg_gap:
            adjacencies.add((idx, idx + 1))
    return adjacencies


def create_breakpoint_segment_table(segment_data, breakpoint_data, adjacencies,
                                    max_brk_dist=2000):
    """Breakpoints as pairs of segment extremities (experiment.py:146-216).

    Filters far-away breakends, events mimicking wild-type adjacencies, and
    loop-back inversions.
    """
    closest_segments = find_closest_segment_end(segment_data, breakpoint_data)

    closest_segments = (
        closest_segments.set_index(['prediction_id', 'prediction_side'])
        .unstack()
        .dropna()
        .reset_index()
    )

    breakpoint_segment = []
    for _, row in closest_segments.iterrows():
        if row['dist'].sum() > max_brk_dist:
            continue

        prediction_id = row['prediction_id'].iloc[0]
        n_1 = row['segment_idx'][0]
        n_2 = row['segment_idx'][1]
        side_1 = row['segment_side'][0]
        side_2 = row['segment_side'][1]

        # remove small events that look like wild type adjacencies
        if (n_1, n_2) in adjacencies and side_1 == 1 and side_2 == 0:
            continue
        if (n_2, n_1) in adjacencies and side_2 == 1 and side_1 == 0:
            continue

        # no support for loop back inversions
        if (n_1, side_1) == (n_2, side_2):
            continue

        breakpoint_segment.append((prediction_id, n_1, side_1, n_2, side_2))

    return pd.DataFrame(
        breakpoint_segment,
        columns=['prediction_id', 'n_1', 'side_1', 'n_2', 'side_2'])


def convert_breakpoints_to_dict(breakpoint_segment_data):
    breakpoints = dict()
    for idx in breakpoint_segment_data.index:
        prediction_id = breakpoint_segment_data.loc[idx, 'prediction_id']
        n_1, side_1, n_2, side_2 = breakpoint_segment_data.loc[
            idx, ['n_1', 'side_1', 'n_2', 'side_2']].values
        breakpoints[prediction_id] = frozenset([(n_1, side_1), (n_2, side_2)])
    return breakpoints


def create_experiment(count_filename, breakpoint_filename, experiment_filename,
                      max_brk_dist=2000, min_length=None):
    """Build and pickle an Experiment from count/breakpoint TSVs
    (experiment.py:228-241)."""
    count_data = pd.read_csv(count_filename, sep='\t',
                             converters={'chromosome': str})

    if min_length is not None:
        count_data = count_data[count_data['length'] > min_length]

    breakpoint_data = pd.read_csv(
        breakpoint_filename, sep='\t',
        converters={'chromosome_1': str, 'chromosome_2': str})

    experiment = Experiment(count_data, breakpoint_data, max_brk_dist=max_brk_dist)

    with open(experiment_filename, 'wb') as f:
        pickle.dump(experiment, f)


class Experiment(object):
    """Container binding a count table and breakpoint predictions
    (experiment.py:244-320)."""

    def __init__(self, count_data, breakpoint_data=None, max_brk_dist=2000,
                 max_seg_gap=int(3e6)):
        self.count_data = count_data

        breakpoint_cols = [
            'prediction_id',
            'chromosome_1', 'strand_1', 'position_1',
            'chromosome_2', 'strand_2', 'position_2',
        ]

        if breakpoint_data is not None:
            self.breakpoint_data = breakpoint_data[breakpoint_cols]
        else:
            self.breakpoint_data = pd.DataFrame(columns=breakpoint_cols)

        chromosomes = self.count_data['chromosome'].unique()

        self.breakpoint_data = self.breakpoint_data[(
            (self.breakpoint_data['chromosome_1'].isin(chromosomes)) &
            (self.breakpoint_data['chromosome_2'].isin(chromosomes))
        )]

        self.count_data = self.count_data.reset_index(drop=True).reset_index()

        self.adjacencies = get_wild_type_adjacencies(self.count_data, max_seg_gap)

        self.breakpoint_segment_data = create_breakpoint_segment_table(
            self.count_data, self.breakpoint_data, self.adjacencies,
            max_brk_dist=max_brk_dist)
        self.breakpoint_segment_data = self.breakpoint_segment_data.merge(
            self.breakpoint_data, on='prediction_id')

    @property
    def segment_chromosome_id(self):
        return self.count_data['chromosome'].values

    @property
    def segment_start(self):
        return self.count_data['start'].values

    @property
    def segment_end(self):
        return self.count_data['end'].values

    @property
    def segment_major_is_allele_a(self):
        return self.count_data['major_is_allele_a'].values

    @property
    def x(self):
        return self.count_data[['major_readcount', 'minor_readcount', 'readcount']].values

    @property
    def l(self):
        return self.count_data['length'].values

    @property
    def breakpoints(self):
        return convert_breakpoints_to_dict(self.breakpoint_segment_data)

    @property
    def chains(self):
        chain_start = [0]
        chain_end = [len(self.count_data.index)]
        for idx in range(len(self.count_data.index) - 1):
            if (idx, idx + 1) not in self.adjacencies:
                chain_end.append(idx + 1)
                chain_start.append(idx + 1)
        return zip(sorted(chain_start), sorted(chain_end))


def create_segment_table(experiment):
    """Per-segment observation table (experiment.py:323-351)."""
    data = pd.DataFrame({
        'chromosome': experiment.segment_chromosome_id,
        'start': experiment.segment_start,
        'end': experiment.segment_end,
        'length': experiment.l,
        'major_readcount': experiment.x[:, 0],
        'minor_readcount': experiment.x[:, 1],
        'readcount': experiment.x[:, 2],
    })
    try:
        data['major_is_allele_a'] = experiment.segment_major_is_allele_a
    except KeyError:
        pass

    data['allele_ratio'] = (
        data['minor_readcount'] / (data['major_readcount'] + data['minor_readcount']))
    data['allele_ratio'] = data['allele_ratio'].fillna(0)

    data['major_depth'] = data['readcount'] * (1. - data['allele_ratio']) / data['length']
    data['minor_depth'] = data['readcount'] * data['allele_ratio'] / data['length']
    data['total_depth'] = data['readcount'] / data['length']

    return data


def create_cn_table(experiment, cn, h, phi=None):
    """Copy-number results table (experiment.py:354-394)."""
    data = create_segment_table(experiment)

    for m in range(0, cn.shape[1]):
        data['major_{0}'.format(m)] = cn[:, m, 0]
        data['minor_{0}'.format(m)] = cn[:, m, 1]

    data['major_raw'] = (data['major_depth'] - data['major_0'] * h[0]) / h[1:].sum()
    data['minor_raw'] = (data['minor_depth'] - data['minor_0'] * h[0]) / h[1:].sum()

    data['major_depth_e'] = (cn[:, :, 0] * h[np.newaxis, :]).sum(axis=-1)
    data['minor_depth_e'] = (cn[:, :, 1] * h[np.newaxis, :]).sum(axis=-1)
    data['total_depth_e'] = (cn.sum(axis=-1) * h[np.newaxis, :]).sum(axis=-1)

    data['major_e'] = data['major_depth_e'] * experiment.l
    data['minor_e'] = data['minor_depth_e'] * experiment.l
    data['total_e'] = data['total_depth_e'] * experiment.l

    data['major_raw_e'] = (data['major_depth_e'] - data['major_0'] * h[0]) / h[1:].sum()
    data['minor_raw_e'] = (data['minor_depth_e'] - data['minor_0'] * h[0]) / h[1:].sum()

    if 'major_2' in data:
        data['major_diff'] = np.absolute(data['major_1'] - data['major_2'])
        data['minor_diff'] = np.absolute(data['minor_1'] - data['minor_2'])

    return data


def create_brk_cn_table(brk_cn, breakpoint_segment_data):
    """Breakpoint copy-number results table (experiment.py:397-422)."""
    if len(brk_cn) == 0:
        return pd.DataFrame(columns=['prediction_id'])

    brk_cn_table = pd.DataFrame(list(brk_cn.values()), index=list(brk_cn.keys()))
    brk_cn_table.columns = ['cn_{}'.format(m) for m in brk_cn_table.columns]
    brk_cn_table.index.name = 'prediction_id'
    brk_cn_table = brk_cn_table.reset_index()

    brk_cn_table = brk_cn_table.merge(
        breakpoint_segment_data, on='prediction_id').fillna(0.)

    return brk_cn_table
